package graft.operators

import graft.SparkSpec

/** BM25 (q87): hand-computed Lucene-form scores, length normalization,
  * and the top-k contract. */
class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  // N=3, avgdl=2; df(spark)=2, idf=ln(1+1.5/2.5)=ln(1.6)
  private val docs = Seq(
    (1L, "spark fast spark"), (2L, "slow table"), (3L, "spark")
  ).toDF("doc_id", "text")

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scores match the closed form; length normalization outranks raw tf") {
    val out = TextSearch.bm25TopK(docs, "spark", k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val idf = math.log(1.6)
    val s1 = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 2))
    val s3 = idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 1.0 / 2))
    // the short exact-match doc beats the longer double-mention doc
    assert(out.map(_._1).toSeq === Seq(3L, 1L), s"ranking: ${out.toSeq}")
    assert(out.toMap === Map(3L -> r4(s3), 1L -> r4(s1)), s"scores: ${out.toSeq}")
  }

  test("ONE corpus pass: every consumer reads the pinned per-doc projection, never the source") {
    // N/avgdl and the tf explode must all derive from the single pinned
    // (doc_id, dl, qs) projection (VERDICT r11 #7 — the stats aggregate
    // was a second full scan that re-tokenized every document). With
    // the pin, the plan's only leaves are the checkpoint RDD — zero
    // scans of the docs relation remain.
    val plan = TextSearch.bm25TopK(docs, "spark", k = 10)
      .queryExecution.optimizedPlan
    val sourceScans = plan.collectLeaves().count {
      case _: org.apache.spark.sql.execution.LogicalRDD => false
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.output.exists(_.name == "text")
      case _ => false
    }
    assert(sourceScans === 0,
      s"expected zero corpus re-scans (all leaves read the pin):\n$plan")
    val pinLeaves = plan.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }
    assert(pinLeaves.nonEmpty && pinLeaves.forall(_.output.exists(_.name == "qs")),
      s"every leaf must be the pinned (doc_id, dl, qs) projection:\n$plan")
  }

  test("tfidfTopK: closed-form scores, distinctive terms outrank common ones") {
    // 'rare' appears twice in doc 1 only: tfidf = 2*ln(3/1)
    // 'common' appears in all 3 docs: idf = ln(1) = 0
    val d = Seq(
      (1L, "common rare rare"), (2L, "common alpha"), (3L, "common beta")
    ).toDF("doc_id", "text")
    val out = TextSearch.tfidfTopK(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val doc1 = out.filter(_._1 == 1L).toSeq
    assert(doc1.head === ((1L, 1, "rare", r4(2 * math.log(3.0)))))
    // the zero-idf universal token ranks below every distinctive one
    assert(doc1(1)._3 === "common" && doc1(1)._4 === 0.0)
    val doc2 = out.filter(_._1 == 2L).toSeq
    assert(doc2.head._3 === "alpha" && doc2.head._4 === r4(math.log(3.0)))
  }

  test("tfidfTopK is deterministic under repartition and k bounds per doc") {
    val d = Seq((1L, "a b c d e f g"), (2L, "a b x y z")).toDF("doc_id", "text")
    val a = TextSearch.tfidfTopK(d, k = 3).collect().toSeq
    val b = TextSearch.tfidfTopK(d.repartition(5), k = 3).collect().toSeq
    assert(a === b)
    assert(a.groupBy(_.getLong(0)).values.forall(_.size <= 3))
  }

  test("an empty or whitespace query returns the empty result, not an error") {
    assert(TextSearch.bm25TopK(docs, "", k = 5).collect().isEmpty)
    val out = TextSearch.bm25TopK(docs, "   ", k = 5)
    assert(out.columns.toSeq === Seq("doc_id", "score", "n_terms"))
    assert(out.collect().isEmpty)
  }

  test("non-matching docs are absent and k bounds the result") {
    val out = TextSearch.bm25TopK(docs, "spark table", k = 1).collect()
    assert(out.length === 1, s"k=1 must cap: ${out.toSeq}")
    val all = TextSearch.bm25TopK(docs, "spark table", k = 10).collect()
      .map(_.getLong(0)).toSet
    assert(all === Set(1L, 2L, 3L), s"every matching doc scored once: $all")
  }

  test("property: random corpora match a brute-force BM25 re-implementation") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 12).map(i => s"v$i")
    (1 to 3).foreach { trial =>
      val corpus = (1L to 15L).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val docs = corpus.toDF("doc_id", "text")
      val q = Seq("v1", "v2", "v3")
      // brute force with the engine's constants (k1=1.2, b=0.75)
      val n = corpus.size.toDouble
      val avgdl = corpus.map(_._2.split(" ").length).sum.toDouble / n
      val dfm = q.map(t => t -> corpus.count(_._2.split(" ").contains(t))).toMap
      val exp = corpus.flatMap { case (id, text) =>
        val toks = text.split(" ")
        val s = q.map { t =>
          val tf = toks.count(_ == t)
          if (tf == 0 || dfm(t) == 0) 0.0
          else math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
            (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
        }.sum
        if (s > 0) Some(id -> r4(s)) else None
      }.toMap
      val got = TextSearch.bm25TopK(docs, q.mkString(" "), k = 50).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === exp, s"trial $trial: $got vs $exp")
    }
  }

  test("the plan broadcasts the idf table and heaps the top-k (no global sort)") {
    val plan = TextSearch.bm25TopK(docs, "spark slow", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"|Q|-sized idf must broadcast into the score join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as per-partition heaps, not a global sort:\n$plan")
  }

  test("multi-term scores sum per matched term and rank deterministically") {
    val out = TextSearch.bm25TopK(docs, "spark slow", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // doc2 matches 'slow' only; docs 1 and 3 match 'spark' only
    assert(out.toMap === Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"n_terms: ${out.toSeq}")
    val a = TextSearch.bm25TopK(docs, "spark slow", k = 10).collect().toSeq
    val b = TextSearch.bm25TopK(docs.repartition(7), "spark slow", k = 10).collect().toSeq
    assert(a === b)
  }

  private def r8(x: Double) =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse: closed-form fusion — a doc ranked by both lists beats single-list leaders") {
    // list A: 10 first, 20 second; list B: 20 first, 30 second.
    // doc 20 (rank 2 + rank 1) must outrank both single-list rank-1 docs.
    val a = Seq((10L, 1), (20L, 2)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (30L, 2)).toDF("doc_id", "rank")
    val out = TextSearch.rrfFuse(Seq(a, b), topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val c1 = r8(1.0 / 61); val c2 = r8(1.0 / 62)
    assert(out === Seq((20L, c1 + c2, 2L), (10L, c1, 1L), (30L, c2, 1L)),
      s"fusion: $out")
  }

  test("rrfFuse: single-list ties break by doc_id; topK bounds; k0 shifts weights") {
    val a = Seq((5L, 1), (3L, 1)).toDF("doc_id", "rank") // equal ranks
    val out = TextSearch.rrfFuse(Seq(a), topK = 1).collect()
    assert(out.length === 1 && out.head.getLong(0) === 3L)
    val k5 = TextSearch.rrfFuse(Seq(a), topK = 2, k0 = 5).collect()
      .map(_.getDouble(1)).toSeq
    assert(k5 === Seq(r8(1.0 / 6), r8(1.0 / 6)))
  }

  test("rrfFuse is deterministic under repartition") {
    val a = (1 to 50).map(i => (i.toLong, i)).toDF("doc_id", "rank")
    val b = (1 to 50).map(i => ((51 - i).toLong, i)).toDF("doc_id", "rank")
    val x = TextSearch.rrfFuse(Seq(a, b), topK = 10).collect().toSeq
    val y = TextSearch.rrfFuse(Seq(a.repartition(7), b.repartition(3)), topK = 10)
      .collect().toSeq
    assert(x === y && x.nonEmpty)
  }

  test("hardNegatives: positives excluded, BM25 order, k cap, tier parity") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // the positive
      (2L, "alpha beta other words here"), // both terms -> top negative
      (3L, "alpha only in this one longer text pads pads pads"),
      (4L, "nothing relevant at all in here"),
      (5L, "beta beta beta repeated heavily beta")
    ).toDF("doc_id", "text")
    val queries = Seq((100L, "alpha beta", 1L))
      .toDF("query_id", "qtext", "pos_id")
    // maxDfFrac = 1.0 disables common-term pruning on the tiny toy
    // corpus (both query terms sit in 3/5 docs)
    val got = TextSearch.hardNegatives(docs, queries, k = 2, maxDfFrac = 1.0)
      .orderBy("rank")
      .select("rank", "neg_id").as[(Long, Long)].collect().toSeq
    // doc 1 (the positive) never appears; doc 2 carries BOTH query
    // terms and outranks the single-term docs; only k=2 rows emit
    assert(got.map(_._2).forall(_ != 1L))
    assert(got.size === 2 && got.head._2 === 2L)
    // tier parity: broadcastableTerms = 0 forces the full-postings
    // path — identical rows (the size-dispatch contract)
    val full = TextSearch.hardNegatives(docs, queries, k = 2,
        broadcastableTerms = 0L, maxDfFrac = 1.0)
      .orderBy("rank").select("rank", "neg_id").as[(Long, Long)].collect().toSeq
    assert(full === got)
    // doc 4 (no query term) is never a candidate at any k
    val all = TextSearch.hardNegatives(docs, queries, k = 10, maxDfFrac = 1.0)
      .select("neg_id").as[Long].collect().toSet
    assert(!all.contains(4L) && !all.contains(1L))
    // common-term pruning with the min-df survivor rule: a query mixing
    // a rare term with common ones keeps ONLY the rare term at the
    // default bound (alpha/beta sit in 3/5 docs > 50%; gamma is rare),
    // so candidates come from gamma's postings alone
    val mixed = Seq((102L, "alpha beta gamma", 5L))
      .toDF("query_id", "qtext", "pos_id")
    val m = TextSearch.hardNegatives(docs, mixed, k = 10)
      .select("neg_id").as[Long].collect().toSeq
    assert(m === Seq(1L)) // gamma only in doc 1 (pos 5 irrelevant)
    // an ALL-common query still mines (its least-frequent term
    // survives — a query must never lose its whole term set)
    assert(TextSearch.hardNegatives(docs, queries, k = 10).count() > 0L)
    Storage.releaseAll(true)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the whole training-data pipeline as ONE
  * operator: quality gate → repetition gate → exact dedup → near-dup
  * dedup (canonical survivor per family) → benchmark decontamination,
  * with a per-stage manifest of document counts (the audit artifact a
  * production curation run reports).
  *
  * Every stage reuses the already-verified operator (`TextAnalysis
  * .qualityScore`/`repetitionSignals`, `Dedup.jaccardPairs`/
  * `keepCanonical`/`contaminationScores`), so the composition adds no
  * new semantics — only the staging contract:
  *
  *  - **Stage boundaries are materialization points.** Each stage pins
  *    via `pin` (default: a localCheckpoint pinch-point registered with
  *    [[Storage]]) so the next stage and the manifest count read the
  *    pinned result instead of recomputing the prefix chain — the local
  *    analogue of the parquet write a cluster-scale pipeline puts
  *    between stages (swap `pin` for a parquet round-trip via
  *    [[Sinks]] to get exactly that).
  *  - **Per-row gates are filters, not joins.** Quality and repetition
  *    are pure row-local signals (r11 — `topBigramFrac` folds inside
  *    the row), so stages 1–2 are plain filters that ride the scan.
  *    Only genuinely cross-corpus drop sets (decontamination) anti-join,
  *    through the same bounded-count dispatch as `keepCanonical`
  *    (broadcast below `broadcastableIds`, shuffle hash join above) —
  *    no unconditional corpus-fraction broadcast anywhere.
  *  - **Exact dedup is one window, no join**: row_number over
  *    md5(lower(text)) partitions keyed by content, keep rank 1 (lowest
  *    doc_id) — groups are duplicate-set-sized, the shuffle is the one
  *    content shuffle exact dedup fundamentally needs.
  *
  * The 4-decimal quality/repetition quantization makes every threshold
  * comparison engine-exact (the DuckDB oracle mirrors each stage and
  * the manifest compares as INTEGERS — no float tolerance anywhere). */
object Curation {

  /** Thresholds; defaults match q68's oracle. `broadcastableIds` bounds
    * the drop-set dispatch (the `knnJoinAuto` pattern); `driverPairs`
    * bounds the fused driver tier's pair collect (the
    * `connectedComponents` union-find regime — near-dup pairs are
    * metadata, orders of magnitude smaller than the corpus). */
  final case class CurationConfig(
      minQuality: Double = 0.44,
      maxDupWordFrac: Double = 0.8,
      maxTopBigramFrac: Double = 0.1,
      shingle: Int = 3,
      jaccard: Double = 0.5,
      minShared: Long = 3L,
      broadcastableIds: Long = 5000000L,
      driverPairs: Long = 1000000L)

  /** Domain-level curation statistics — the RefinedWeb / C4 host-level
    * gate (Penedo et al. 2023 §3.1: per-host aggregates decide whole
    * domains before any per-document work): for each source, document
    * count, exact within-source duplicate rate (1 − distinct/total over
    * content hashes), mean length, token volume, the dominant language
    * (deterministic mode — count desc, lang asc tiebreak), and a keep
    * verdict for the thresholds (dup_rate ≤ maxDupRate, n_docs ≥
    * minDocs).
    *
    * Scale shape: ONE corpus pass feeding two map-side-combinable
    * aggregations — the signal agg keys on source (distinct content
    * hashes partial-aggregate per task before the shuffle), the
    * language mode on (source, lang), whose rank window runs over the
    * source×lang aggregate table (tiny). The final join is
    * source-cardinality-sized on both sides — broadcast by Spark's own
    * stats. Nothing in the plan grows with documents except the two
    * partial-aggregated exchanges. */
  def domainStats(docs: DataFrame, maxDupRate: Double = 0.5,
                  minDocs: Long = 10L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    // dup_rate is exact DECIMAL(14,4) internally (exact keep threshold)
    // and emitted as DOUBLE — the decimal's nearest double, identical
    // in both engines (VERDICT r11 #1).
    val perSrc = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct"),
      TextAnalysis.dec4(lit(1.0) -
        countDistinct(md5(col("text"))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("dup_rate_dec"),
      round(avg(col("n_chars")), 2).as("mean_chars"),
      sum(TextAnalysis.wsTokenCount(col("text"))).as("n_tokens"))
    val topLang = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("c").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    perSrc.join(topLang, "source")
      .withColumn("keep",
        col("dup_rate_dec") <= maxDupRate && col("n_docs") >= minDocs)
      .select(col("source"), col("n_docs"), col("n_distinct"),
        col("dup_rate_dec").cast(DoubleType).as("dup_rate"),
        col("mean_chars"), col("n_tokens"), col("top_lang"), col("keep"))
      .orderBy("source")
  }

  /** Explicit URL/domain list gate — the published FIRST gate of crawl
    * curation (C4 badword/URL lists, Raffel et al. 2020 §2.2;
    * RefinedWeb URL filtering, Penedo et al. 2023 §3.1): documents
    * from listed domains fall before any per-document text work is
    * spent on them. `allow=false` drops listed keys (blocklist);
    * `allow=true` keeps ONLY listed keys (allowlist). NULL keys follow
    * anti/semi-join semantics: kept by a blocklist (an unlisted key),
    * dropped by an allowlist.
    *
    * Tiers (the q65 machinery):
    *  - exact: broadcast anti/semi join under `broadcastBound` (one
    *    memoized bounded probe), shuffle-hash above — list semantics
    *    exact at any size;
    *  - `bloomFpp` set (blocklist only): the list folds into a
    *    FIXED-SIZE Bloom filter and the gate becomes a row-local
    *    membership probe — no join at all, scan-speed at 100 TB. A
    *    false positive OVER-drops (a clean domain lost at ≈fpp), never
    *    under-drops — the safe direction for a hygiene gate, same
    *    argument as q65's decontamination tier. Not offered for
    *    allowlists, where an FP would wrongly ADMIT. */
  def listGate(docs: DataFrame, list: DataFrame, key: String,
               allow: Boolean = false, broadcastBound: Long = 5000000L,
               bloomFpp: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val keyed = list.select(col(list.columns.head).cast("string").as(key))
    bloomFpp match {
      case Some(fpp) =>
        require(!allow, "listGate: the Bloom tier admits at fpp on an " +
          "allowlist (the unsafe direction) — use the exact join tiers")
        val n = math.max(1L, keyed.count())
        val bf = keyed.stat.bloomFilter(key, n, fpp)
        val bc = docs.sparkSession.sparkContext.broadcast(bf)
        val hit = udf((k: String) => k != null && bc.value.mightContainString(k))
        docs.filter(!hit(col(key)))
      case None =>
        val side =
          if (SizeDispatch.atMost(keyed, broadcastBound)) broadcast(keyed)
          else keyed.hint("shuffle_hash")
        docs.join(side, Seq(key), if (allow) "left_semi" else "left_anti")
    }
  }

  /** Listed-token count for [[badwordGate]] — exposed so a pipeline
    * can EMIT the signal (an audit table, a threshold sweep) rather
    * than gate on it. Tokens are whitespace-split, lowercased, and
    * stripped of surrounding punctuation ("Word," matches "word") —
    * so the count mirrors exactly in SQL. The list rides the closure
    * as a hash set: O(1) membership per token where any builtin
    * array/isin form pays O(|list|) per token — 1000× the work at
    * published list sizes (the same argument as [[listGate]]'s Bloom
    * tier UDF). */
  def badwordCount(textCol: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "badwordCount: empty word list")
    val set = words.iterator.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val cnt = udf((toks: Seq[String]) =>
      if (toks == null) 0L
      else toks.count(t =>
        set.contains(t.replaceAll("^[^a-z0-9]+|[^a-z0-9]+$", ""))).toLong)
    cnt(filter(split(lower(textCol), " "), t => t =!= ""))
  }

  /** Token-level word-list gate — the published C4 TEXT filter
    * (Raffel et al. 2020 §2.2: drop any page containing a word from
    * the public "bad words" list), the content-side sibling of
    * [[listGate]]'s URL tier: that one gates on the page's ADDRESS
    * before any text is read, this one on its token content.
    * `maxFrac = 0` is the hard C4 rule — ANY listed token drops the
    * document; `maxFrac > 0` is the soft fraction policy (keep while
    * listed tokens / tokens ≤ maxFrac — the variant that spares
    * medical/legal text carrying a single flagged term). The fraction
    * compares in exact INTEGER arithmetic on a 4-decimal grid
    * (n_bad·10000 ≤ round(maxFrac·10000)·n_toks), so the verdict is
    * engine-independent. A document with no tokens is kept (no
    * evidence, no verdict).
    *
    * Scale shape: the list is driver metadata BY CONTRACT (published
    * lists are 400–2,000 words — a few KB riding the task closure);
    * the gate is ONE row-local pass over the token array — zero
    * shuffle, zero joins, scan-speed at any corpus size. */
  def badwordGate(docs: DataFrame, words: Seq[String],
                  maxFrac: Double = 0.0,
                  textCol: Column = col("text")): DataFrame = {
    require(maxFrac >= 0.0 && maxFrac < 1.0,
      s"badwordGate: maxFrac must be in [0, 1): $maxFrac")
    val nBad = badwordCount(textCol, words)
    if (maxFrac == 0.0) docs.filter(nBad === 0L)
    else {
      val nToks = size(filter(split(lower(textCol), " "), t => t =!= ""))
      docs.filter(
        nBad * 10000L <= lit(math.round(maxFrac * 10000)) * nToks.cast("long"))
    }
  }

  /** Per-group top-quantile gate — "keep the best `frac` of each
    * source by score" (the FineWeb-edu-style practice: filter
    * thresholds are set as score QUANTILES, not absolute values, so
    * every source contributes its best instead of score-rich sources
    * drowning the rest). The cut is VALUE-BASED: keep score ≥ the
    * group's largest score whose descending cumulative count reaches
    * ceil(frac·n) — ties at the cut all keep, so the verdict is
    * deterministic without any per-document total order (the q83
    * convention). `scoreCol` must be exactly comparable (the
    * 4-decimal DECIMAL every scorer here emits); `frac` quantizes to
    * the same grid, making the keep-count test pure INTEGER
    * arithmetic (cum·10⁴ ≥ frac_q·n — no ceil-of-double boundary
    * hazard). Null scores and null groups drop.
    *
    * Scale shape: the scored projection is PINNED once (`pin`, default
    * a LAZY localCheckpoint pinch-point — swap for a parquet round-trip
    * on a cluster), because the score is typically a text-pass kernel
    * with TWO consumers — the histogram and the final filter; unpinned,
    * the full text pass ran twice (13.7× DuckDB at sf0.1; two corpus
    * scans at 100 TB where one + bounded metadata suffices). The only
    * corpus shuffle is the (group, score) histogram aggregate — BOUNDED
    * at ≤ 10⁴+1 distinct 4-decimal values per group for scores in
    * [0, 1], so it collects as driver metadata (the ccnetBuckets
    * contract; its collect is also the action that materializes the lazy
    * pin — one job, not pin-then-histogram). Cuts are exact integer
    * arithmetic over the ORDERED histogram (sorted by the engine, so the
    * driver never compares engine-typed score values), and ride back as
    * a broadcast LocalRelation for a row-local filter — no per-document
    * window, no second aggregation tree, two jobs total at any corpus
    * size. */
  def keepTopQuantile(docs: DataFrame, scoreCol: Column, groupCol: Column,
                      frac: Double,
                      pin: DataFrame => DataFrame =
                        df => Storage.track(df.localCheckpoint(false))): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"keepTopQuantile: frac=$frac")
    val fq = math.round(frac * 10000)
    val base = pin(docs.withColumn("__g", groupCol).withColumn("__s", scoreCol)
      .filter(col("__s").isNotNull))
    // ENFORCED contract (ADVICE r14): the histogram collect is bounded
    // only because the score is quantized — an unrounded double makes
    // (group × distinct score) corpus-scale and the collect a driver
    // OOM. Require the DECIMAL grid every scorer here emits, and cap
    // the collected rows with a clear error as defense in depth (a
    // quantized score over pathologically many groups must fail loud,
    // not flatten the driver).
    base.schema("__s").dataType match {
      case d: org.apache.spark.sql.types.DecimalType =>
        require(d.scale <= 4,
          s"keepTopQuantile: scoreCol is DECIMAL(${d.precision},${d.scale}) — " +
            "scale must be <= 4 (the quantized-grid contract that bounds the " +
            "histogram collect; cast the score to DecimalType(14, 4))")
      case t =>
        throw new IllegalArgumentException(
          s"keepTopQuantile: scoreCol must be a quantized DECIMAL (got $t) — " +
            "an unrounded score makes the (group, score) histogram corpus-" +
            "scale; cast to DecimalType(14, 4) like every scorer here")
    }
    val HistCap = 1000000
    // bounded histogram (see scaladoc), sorted by the ENGINE — score
    // descending within group — so the driver pass is order-blind
    val hist = base.groupBy("__g", "__s").agg(count(lit(1)).as("__c"))
      .orderBy(col("__g"), col("__s").desc).limit(HistCap + 1).collect()
    require(hist.length <= HistCap,
      s"keepTopQuantile: (group, score) histogram exceeds $HistCap rows — " +
        "not driver metadata; reduce group cardinality or coarsen the score grid")
    val nByG = scala.collection.mutable.HashMap.empty[Any, Long]
    hist.foreach(r => nByG(r.get(0)) = nByG.getOrElse(r.get(0), 0L) + r.getLong(2))
    // first (= highest) score whose descending cumulative count reaches
    // ceil(frac*n) — ties at the cut all keep (cum*10^4 >= fq*n, exact
    // integer arithmetic; identical to the r13 window/max-filter form)
    val cum = scala.collection.mutable.HashMap.empty[Any, Long]
    val cutRows = hist.flatMap { r =>
      val g = r.get(0)
      val before = cum.getOrElse(g, 0L)
      val after = before + r.getLong(2)
      cum(g) = after
      if (before * 10000L < fq * nByG(g) && after * 10000L >= fq * nByG(g))
        Some(org.apache.spark.sql.Row(g, r.get(1)))
      else None
    }
    val spark = docs.sparkSession
    val cutSchema = org.apache.spark.sql.types.StructType(Seq(
      base.schema("__g"), base.schema("__s").copy(name = "__cut")))
    val cuts = spark.createDataFrame(
      java.util.Arrays.asList(cutRows: _*), cutSchema)
    import org.apache.spark.sql.functions.broadcast
    base.join(broadcast(cuts), Seq("__g"))
      .filter(col("__s") >= col("__cut"))
      .drop("__g", "__s", "__cut")
  }

  /** Corpus snapshot diff — the release audit between two corpus
    * versions (the "what changed since v1" table a dataset card
    * publishes — Gebru et al. 2021 datasheets practice — and the
    * sanity gate before shipping a re-curated corpus: did the new
    * threshold REALLY only drop near-dups?). Per document id:
    * `added` / `removed` / `changed` (content hash differs) /
    * `unchanged`. Ids are unique per snapshot by the store contract.
    *
    * Scale shape: content compares on md5(text) computed row-locally
    * BEFORE the join, so the one full-outer id join — the only
    * shuffle — exchanges (id, hash) rows, never document text; with
    * both snapshots bucketed/partitioned by id the join co-locates
    * and the shuffle disappears entirely. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   key: String = "doc_id", textCol: String = "text"): DataFrame = {
    val a = before.select(col(key).as("__k"), md5(col(textCol)).as("__ha"))
    val b = after.select(col(key).as("__k"), md5(col(textCol)).as("__hb"))
    a.join(b, Seq("__k"), "full_outer")
      .select(col("__k").as(key),
        when(col("__ha").isNull, "added")
          .when(col("__hb").isNull, "removed")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The release-notes rollup of [[snapshotDiff]]: status → count. */
  def snapshotDiffSummary(before: DataFrame, after: DataFrame,
                          key: String = "doc_id",
                          textCol: String = "text"): DataFrame =
    snapshotDiff(before, after, key, textCol)
      .groupBy("status").agg(count(lit(1)).as("n")).orderBy("status")

  /** The per-increment gate prefix of [[curate]] for micro-batch /
    * incremental use: optional [[listGate]] blocklist FIRST, optional
    * markup cleaning, then quality gate → repetition gate → exact
    * within-increment dedup. No manifest counts and no pinning (the
    * near-dup and decontamination stages belong to the CROSS-CORPUS
    * probe the caller composes next — see
    * `StreamingOps.curatedIngestToStore`). The text gates are row-local
    * filters (no join, no size dispatch — any batch size streams).
    * Deterministic per input, so an at-least-once replay of the same
    * batch recomputes identical survivors. */
  def gateBatch(docs: DataFrame, cfg: CurationConfig = CurationConfig(),
                cleanMarkupFirst: Boolean = false,
                blocklist: Option[DataFrame] = None,
                blocklistKey: String = "source",
                badwords: Option[Seq[String]] = None,
                badwordMaxFrac: Double = 0.0): DataFrame = {
    // the list gate runs FIRST — cheapest verdict, no text touched for
    // a blocked domain (the published gate order)
    val listed = blocklist.fold(docs)(bl => listGate(docs, bl, blocklistKey))
    // then the C4 word-list text gate — one row-local token pass,
    // still cheaper than the fused signal kernel behind the quality
    // and repetition gates below
    val worded =
      badwords.fold(listed)(ws => badwordGate(listed, ws, badwordMaxFrac))
    val cleaned =
      if (cleanMarkupFirst)
        worded.withColumn("text", TextAnalysis.cleanMarkup(col("text")))
      else worded
    // quality + repetition are row-local signals off the fused kernel
    // (one text pass): one filter, no join, no dispatch — the gate
    // prefix is a pure scan up to the one content shuffle exact dedup
    // needs
    val sig = col("__sig")
    val s2 = cleaned.withColumn("__sig", TextAnalysis.curationSignalsUdf(col("text")))
      .filter(
        TextAnalysis.qualityFromSignals(sig) >= cfg.minQuality &&
          !(TextAnalysis.topBigramFracFromSignals(sig) >= cfg.maxTopBigramFrac ||
            TextAnalysis.dupWordFracFromSignals(sig) >= cfg.maxDupWordFrac))
      .drop("__sig")
    val w = Window.partitionBy(md5(lower(col("text")))).orderBy(col("doc_id"))
    s2.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Runs the pipeline over `docs` (schema incl. doc_id, text) against a
    * held-out `benchmark`; returns (survivors, manifest). The manifest
    * has one row per stage: (stage, docs_in, docs_out).
    *
    * Staging (reworked per VERDICT r10 #2 — the old shape pinned all
    * five stages and ran a separate count() job per stage, a pure
    * double-pay at every scale):
    *  - **Stages 1–3 fuse into ONE spine plan.** Quality and repetition
    *    are row-local FILTERS (zero joins, zero shuffles); exact dedup
    *    is one content-keyed window — the spine is a single scan plus
    *    the one content shuffle. Only s3 pins: it feeds BOTH the
    *    near-dup pair kernel and the canonical-survivor join.
    *  - **Manifest counts ride the pin materializations** as
    *    `observe()` metrics (CollectMetrics aggregates per stage
    *    boundary inside the same job) — zero extra jobs. Every observe
    *    node sits on the single spine path, never on a branch that the
    *    plan duplicates, so each metric is counted exactly once.
    *  - With a NON-materializing `pin` (identity — e.g. the
    *    full-lineage plan-assertion specs), no action runs inside
    *    curate; counts then fall back to per-stage count() jobs against
    *    the same intermediates (the pre-r11 behavior). */
  def curate(docs: DataFrame, benchmark: DataFrame,
             cfg: CurationConfig = CurationConfig(),
             pin: DataFrame => DataFrame =
               df => Storage.track(df.localCheckpoint(true)),
             blocklist: Option[DataFrame] = None,
             blocklistKey: String = "source"): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.Observation

    val Seq(oB, o0, o1, o2, o3, o4, o5) = Seq.fill(7)(Observation())
    def counted(df: DataFrame, o: Observation): DataFrame =
      df.observe(o, count(lit(1)).as("n"))

    // -- optional stage 0 (C4/RefinedWeb §3.1): the explicit domain
    // list gate, FIRST — a blocked domain costs a join probe, never a
    // text pass. Its manifest count rides the spine like every other
    // stage; without a blocklist neither the node nor the row exists.
    val listed = blocklist.fold(docs)(bl =>
      listGate(counted(docs, oB), bl, blocklistKey))

    // -- fused spine: input count → quality filter → repetition filter
    // → exact dedup, with an observe at each stage boundary. All
    // row-local until the one content shuffle; each metric node appears
    // exactly once on the spine path. The spine CARRIES the keep-rule
    // quality (`__q`) and the hashed shingle set (`__sh`): one text
    // pass computes every downstream per-row signal, so the near-dup
    // pair kernel and the contamination probe read pinned columns
    // instead of re-running the shingle kernel per stage. (The pin
    // artifact grows by the shingle arrays — a compute-for-storage
    // trade; a cluster-scale parquet `pin` that prefers small
    // artifacts can drop the column and recompute.)
    // gate signals come from the fused kernel (one text pass; the
    // nondeterministic marker stops Catalyst inlining it per filter) —
    // the filter/score expressions over them are bit-identical to the
    // qualityScore/topBigramFrac/dupWordFrac chains the oracle mirrors
    val sig = col("__sig")
    val quality = TextAnalysis.qualityFromSignals(sig) >= cfg.minQuality
    val repetitive = TextAnalysis.topBigramFracFromSignals(sig) >= cfg.maxTopBigramFrac ||
      TextAnalysis.dupWordFracFromSignals(sig) >= cfg.maxDupWordFrac
    val withSig = listed.withColumn("__sig", TextAnalysis.curationSignalsUdf(col("text")))
    val q = withSig.filter(quality)
    val s2plan = counted(counted(counted(withSig, o0).filter(quality), o1)
      .filter(!repetitive), o2)
    val w = Window.partitionBy(md5(lower(col("text")))).orderBy(col("doc_id"))
    val spine = counted(s2plan.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn"), o3)
      // -Inf = the slot nulls-last ordering would give a null quality;
      // unreachable here (stage 1 already filtered on quality), kept as
      // a defensive exact equivalent
      .withColumn("__q", coalesce(TextAnalysis.qualityFromSignals(sig),
        lit(Double.NegativeInfinity)))
      .withColumn("__sh", Dedup.hashedShinglesCol(cfg.shingle))
      .drop("__sig")
    val s3x = pin(spine)
    // identity pin returns its argument: nothing materialized, fall back
    // to count() jobs (exotic lazy pins are caught by the await timeout)
    val materializes = !(s3x eq spine)
    val outCols = docs.columns.map(col).toSeq

    def resolved(o: Observation, fallback: => Long): Long =
      if (!materializes) fallback
      else try {
        import scala.concurrent.duration._
        // the metrics row arrives on the async listener bus moments
        // after the pin's job; the generous timeout only matters for a
        // custom pin that materializes lazily, where the fallback count
        // doubles as the materializing action
        scala.concurrent.Await.result(o.future, 120.seconds).getAs[Long]("n")
      } catch { case _: java.util.concurrent.TimeoutException => fallback }

    val n0 = resolved(o0, listed.count())
    // stage-0 row only when the gate exists; its count rides the same
    // spine actions (the observe sits under the list-gate join)
    val stage0: Seq[(String, Long, Long)] =
      if (blocklist.isEmpty) Nil
      else Seq(("0_blocklist", resolved(oB, docs.count()), n0))
    val n1 = resolved(o1, q.count())
    val n2 = resolved(o2, q.filter(!repetitive).count())
    val n3 = resolved(o3, s3x.count())

    val shForPairs = s3x.select(col("doc_id"), col("__sh").as("shingles"), col("__q"))

    val pairsPlan = Dedup.jaccardQualityPairsFromShingles(shForPairs, cfg.jaccard)
    val dBound = math.min(cfg.broadcastableIds, cfg.driverPairs)

    // -- pair-aggregation staging, two regimes (n3 is already on the
    // driver, so the dispatch costs no probe job):
    //  * deduped corpus itself below the driver-pair bound → ONE
    //    bounded CollectLimit over the aggregation: the pair set is
    //    complete iff it fits the bound, and pin + probe + collect
    //    collapse into a single job chain with no checkpoint write
    //    (VERDICT r12 #1 — the last fixed-overhead shave q68 had).
    //    Overflow (pathological all-duplicates corpus) re-runs the
    //    aggregation once for the staged pin — bounded by n3 ≤ dBound
    //    docs, and unreachable for a corpus that large without ~n3²/2
    //    pairs.
    //  * large corpus → pin once; the memoized bounded probe and both
    //    tiers read the pinned blocks (pairs can still be metadata at
    //    any corpus size, and the pin guarantees the aggregation never
    //    runs twice in the regime where it is the dominant cost).
    lazy val pairsQ = pin(pairsPlan)
    val directRows: Option[Array[org.apache.spark.sql.Row]] =
      if (dBound > 0 && n3 <= dBound) {
        val r = pairsPlan.limit(dBound.toInt + 1).collect()
        if (r.length <= dBound) Some(r) else None
      } else None
    val driverTier = directRows.isDefined ||
      (dBound > 0 && n3 > dBound && SizeDispatch.atMost(pairsQ, dBound))

    // -- fused driver tier: near-dup pairs are METADATA (edges between
    // near-duplicates — the regime where connectedComponents already
    // runs a driver union-find and keepCanonical collects its labels).
    // Collect the qualifying pairs WITH both members' qualities,
    // evaluate the keep-rule on the driver — the loser count
    // gives n4 by arithmetic (losers ⊆ s3 members), and n4 bounds the
    // contamination drop set, so that dispatch needs no probe job
    // either. A pair set over the bound runs the staged distributed
    // path below over the pinned pairs.
    if (driverTier) {
      val rows = directRows.getOrElse(pairsQ.collect())
        // union-find over the collected pairs (path compression, larger
        // root under smaller — the Clustering.localUnionFind rule), then
        // the keep-rule per component: max quality, ties to lowest id —
        // exactly keepCanonical's window order
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        val qual = scala.collection.mutable.HashMap.empty[Long, Double]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        rows.foreach { r =>
          val (da, qa, db, qb) = (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
          parent.getOrElseUpdate(da, da); parent.getOrElseUpdate(db, db)
          qual(da) = qa; qual(db) = qb
          val (ra, rb) = (find(da), find(db))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val losers = parent.keys.toSeq.groupBy(find).valuesIterator.flatMap { members =>
          val winner = members.reduceLeft { (a, b) =>
            val c = java.lang.Double.compare(qual(a), qual(b))
            if (c > 0) a else if (c < 0) b else math.min(a, b)
          }
          members.iterator.filter(_ != winner)
        }.toSeq
        val n4 = n3 - losers.size
        // -- fused drop: both remaining stages are row-local given
        // driver-sized side state — the loser ids are already on the
        // driver, and the exact decontamination tier ALREADY assumes
        // the benchmark's distinct shingle set is broadcast-sized
        // (contaminationFromShingles broadcasts it; bigger suites take
        // the Bloom tier). So instead of anti-join + join/groupBy +
        // anti-join (three exchanges, ~10 AQE jobs of scheduling
        // overhead), ONE filter over the pinned spine: binary search
        // of sorted primitive arrays, early-exit at minShared —
        // verdict-identical to `shared >= minShared` over the
        // broadcast-join count, since a doc's contamination depends on
        // no other doc. The benchmark side costs one tiny job.
        val bShingles = Dedup.benchmarkShingleArray(benchmark, cfg.shingle)
        val loserArr = losers.toArray
        java.util.Arrays.sort(loserArr)
        val bcB = spark.sparkContext.broadcast(bShingles)
        val bcL = spark.sparkContext.broadcast(loserArr)
        val minShared = cfg.minShared
        val keepRow = udf { (id: Long, sh: Seq[Long]) =>
          if (java.util.Arrays.binarySearch(bcL.value, id) >= 0) false
          else {
            var shared = 0L
            val it = sh.iterator
            while (it.hasNext && shared < minShared)
              if (java.util.Arrays.binarySearch(bcB.value, it.next()) >= 0) shared += 1
            shared < minShared
          }
        }
        val s5 = pin(counted(
          s3x.filter(keepRow(col("doc_id"), col("__sh"))).select(outCols: _*), o5))
        val n5 = resolved(o5, s5.count())
        val manifest = (stage0 ++ Seq(
          ("1_quality", n0, n1),
          ("2_repetition", n1, n2),
          ("3_exact", n2, n3),
          ("4_neardup", n3, n4),
          ("5_decontam", n4, n5)))
          .toDF("stage", "docs_in", "docs_out")
        (s5, manifest)

    } else {
        // staged distributed path: pair graph over the driver bound (or
        // dispatch disabled). Same operators, stage-pinned, reading the
        // SAME pinned pairs and carried __sh/__q columns — neither the
        // shingle kernel nor the pair aggregation re-runs here.
        def dropIds(base: DataFrame, ids: DataFrame): DataFrame = {
          val side =
            if (SizeDispatch.atMost(ids, cfg.broadcastableIds)) broadcast(ids)
            else ids.hint("shuffle_hash")
          base.join(side, Seq("doc_id"), "left_anti")
        }
        val pairs = pairsQ.select("da", "db")
        val s4 = pin(counted(Dedup.keepCanonical(s3x, pairs, col("__q"),
          broadcastableLabels = cfg.broadcastableIds), o4))
        // pin the drop set BEFORE the dispatch probe: unpinned, the
        // probe's bounded count and the anti join's broadcast build
        // would each run the contamination aggregation once (the q60
        // double-pay, r9) — pinned, it runs once and both consumers
        // read the blocks
        val contaminated = pin(Dedup.contaminationFromShingles(
          s4.select(col("doc_id"), col("__sh").as("shingles")),
          benchmark, cfg.shingle, cfg.minShared)
          .filter(col("contaminated")).select("doc_id"))
        val s5 = pin(counted(dropIds(s4, contaminated).select(outCols: _*), o5))
        val n4 = resolved(o4, s4.count())
        val n5 = resolved(o5, s5.count())
        val manifest = (stage0 ++ Seq(
          ("1_quality", n0, n1),
          ("2_repetition", n1, n2),
          ("3_exact", n2, n3),
          ("4_neardup", n3, n4),
          ("5_decontam", n4, n5)))
          .toDF("stage", "docs_in", "docs_out")
        (s5, manifest)
    }
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analyzers for the index/BM25 family (r16; VERDICT r15 next #6 —
  * Lucene-grade defaults are the first thing a search user reaches
  * for; until now tokenization was lower+split everywhere):
  *
  *  - `simple`  — lowercase, split on single spaces, drop empties
  *                (the status-quo q87/q147 analyzer, byte-compatible);
  *  - `stop`    — `simple` + stopword removal ([[StopWords]], an
  *                explicit 33-word list mirrored verbatim in SQL
  *                oracles — the q134 explicit-mapping discipline);
  *  - `english` — `stop` + the classic PORTER STEMMER (Porter 1980,
  *                "An algorithm for suffix stripping" — implemented
  *                from the paper, dependency-free; gated by the
  *                paper's own example vectors since no SQL engine in
  *                the sandbox can mirror it).
  *
  * The analyzer is applied identically on the WRITE path (postings)
  * and the QUERY path (search terms), and a persisted index records
  * its analyzer in the meta sidecar so mixed-analyzer operations are
  * refused ([[TextIndex]]). Document length (`dl`) under `stop`/
  * `english` is the ANALYZED token count (the Lucene norm — stopwords
  * carry no length mass); under `simple` it stays the raw split count
  * including empties (the pre-analyzer q87 contract, unchanged). */
object Analyzer {

  val Simple = "simple"
  val Stop = "stop"
  val English = "english"
  val Names: Seq[String] = Seq(Simple, Stop, English)

  /** The stopword policy — OUR explicit list (33 common English
    * function words; any SQL oracle inlines exactly these). */
  val StopWords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  private val stopSet: Set[String] = StopWords.toSet

  /** Columnar analysis of a text column → array<string> of terms. The
    * stemmer is a one-pass kernel UDF over the token array (the engine
    * kernel convention — imperative suffix stripping has no Column
    * form); `simple`/`stop` stay pure HOF chains. */
  def analyze(name: String, text: Column): Column = name match {
    case Simple => filter(split(lower(text), " "), t => t =!= "")
    case Stop =>
      filter(split(lower(text), " "),
        t => t =!= "" && !t.isin(StopWords: _*))
    case English => stemArrayUdf(
      filter(split(lower(text), " "),
        t => t =!= "" && !t.isin(StopWords: _*)))
    case other => throw new IllegalArgumentException(
      s"unknown analyzer '$other' — one of ${Names.mkString(", ")}")
  }

  /** Driver twin for query-side analysis — identical output to
    * [[analyze]] on the same text (spec-asserted). Lowercasing pins
    * Locale.ROOT: Spark's `lower()` is locale-independent, and a
    * JVM-default-locale lowercase (e.g. Turkish 'I' → 'ı') would break
    * the write/query analyzer-parity contract the index relies on. */
  def analyzeLocal(name: String, text: String): Seq[String] = {
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    name match {
      case Simple => lowered.split(" ").filter(_.nonEmpty).toSeq
      case Stop => lowered.split(" ")
        .filter(t => t.nonEmpty && !stopSet(t)).toSeq
      case English => lowered.split(" ")
        .filter(t => t.nonEmpty && !stopSet(t)).map(porterStem).toSeq
      case other => throw new IllegalArgumentException(
        s"unknown analyzer '$other' — one of ${Names.mkString(", ")}")
    }
  }

  private val stemArrayUdf = udf((toks: Seq[String]) =>
    if (toks == null) null else toks.map(porterStem))

  /** Scalar stemming kernel for exploded (token, position) rows — the
    * positional write path ([[TextIndex]]) stems AFTER the explode so
    * raw-sequence positions survive; same per-token cost as the array
    * form. */
  private[operators] val stemUdf =
    udf((t: String) => if (t == null) null else porterStem(t))

  // ------------------------------------------ Porter stemmer (1980)
  /** The classic Porter algorithm, implemented from the published
    * paper: measure m over the [C](VC)^m[V] form, longest-match rule
    * selection per step, steps 1a/1b(+cleanup)/1c/2/3/4/5a/5b. Words
    * shorter than 3 letters pass through (the paper's practical rule).
    * Only a-z words are stemmed; anything with other characters passes
    * through untouched (numbers, punctuation-bearing tokens). */
  def porterStem(w0: String): String = {
    if (w0.length < 3 || !w0.forall(c => c >= 'a' && c <= 'z')) return w0
    var w = w0

    def isCons(s: String, i: Int): Boolean = s.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !isCons(s, i - 1)
      case _ => true
    }
    /** m of the given stem. */
    def measure(s: String): Int = {
      var m = 0; var i = 0
      val n = s.length
      while (i < n && isCons(s, i)) i += 1 // leading C block
      while (i < n) {
        while (i < n && !isCons(s, i)) i += 1 // V block
        if (i < n) { // a VC boundary
          m += 1
          while (i < n && isCons(s, i)) i += 1
        }
      }
      m
    }
    def hasVowel(s: String): Boolean = s.indices.exists(!isCons(s, _))
    def endsDoubleCons(s: String): Boolean =
      s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
        isCons(s, s.length - 1)
    /** *o: stem ends cvc, final c not w/x/y. */
    def endsCvc(s: String): Boolean =
      s.length >= 3 && isCons(s, s.length - 3) && !isCons(s, s.length - 2) &&
        isCons(s, s.length - 1) && !"wxy".contains(s.charAt(s.length - 1))

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    var cleanup = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) {
      w = w.dropRight(2); cleanup = true
    } else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) {
      w = w.dropRight(3); cleanup = true
    }
    if (cleanup) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleCons(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w += "e"
    }

    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1)))
      w = w.dropRight(1) + "i"

    // steps 2-4: longest-matching suffix in the step's table, rule
    // fires iff the condition holds on the stem (no fallthrough)
    def applyTable(table: Seq[(String, String)], cond: Int => Boolean): Unit =
      table.filter { case (suf, _) => w.endsWith(suf) }
        .sortBy(-_._1.length).headOption.foreach { case (suf, rep) =>
          val stem = w.dropRight(suf.length)
          if (cond(measure(stem))) w = stem + rep
        }

    applyTable(Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
      "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
      "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"), _ > 0)

    applyTable(Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""), _ > 0)

    // step 4: plain deletions at m>1; ION additionally needs *S or *T
    locally {
      val table = Seq("al", "ance", "ence", "er", "ic", "able", "ible",
        "ant", "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
        "ous", "ive", "ize")
      table.filter(w.endsWith).sortBy(-_.length).headOption.foreach { suf =>
        val stem = w.dropRight(suf.length)
        val ok =
          if (suf == "ion") measure(stem) > 1 && stem.nonEmpty &&
            (stem.last == 's' || stem.last == 't')
          else measure(stem) > 1
        if (ok) w = stem
      }
    }

    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // step 5b
    if (measure(w) > 1 && endsDoubleCons(w) && w.last == 'l')
      w = w.dropRight(1)
    w
  }
}

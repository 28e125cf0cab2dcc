package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data curation:
  * tokenization, shingling, quality features, fingerprints, language ID.
  *
  * Everything here is built from codegen'd `functions._` expressions —
  * no UDFs — so whole-stage codegen keeps the scan→project pipeline in
  * one fused loop, and every primitive is reproducible in ANSI SQL for
  * the DuckDB oracle (md5 for hashing, regex for token classes).
  */
object Text {

  /** Whitespace word list. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles (the MinHash/Jaccard unit). Documents
    * shorter than n words contribute their full text as one shingle. */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.expressions.WordShingles(ColumnBridge.expression(text), n))
  }

  /** Word bigrams (order-preserving, non-distinct); documents shorter
    * than two words contribute none. Native expression — the HOF
    * `transform(sequence, element_at)` form is interpreter-bound. */
  def bigrams(text: Column): Column = ngrams(text, 2)

  /** Order-preserving, non-distinct word n-grams (the repetition-
    * counting unit — `shingles` dedups, which loses multiplicity);
    * documents shorter than n words contribute none. */
  def ngrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.WordShingles(
      ColumnBridge.expression(text), n, distinct = false, shortAsSelf = false))
  }

  /** One-pass (bgh, ah, th) word-bigram hash structs — the PMI-family
    * unit: bit-identical to `explode(bigrams)` → 3 × [[md5Prefix60]] +
    * 2 × substring_index, with each word digested once per position
    * and no intermediate string (see
    * [[graft.functions.expressions.BigramHashes]]). */
  def bigramHashes(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.BigramHashes(
      ColumnBridge.expression(text)))
  }

  /** Deterministic hash bucket in [0, buckets) from the md5 of a key —
    * the sampling primitive for training-data pipelines: the decision
    * is a pure function of the id (reproducible across runs, engines
    * and cluster sizes; no RNG state, no reservoir), and rates can be
    * tightened later without resampling (bucket < r1 ⊃ bucket < r2). */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(md5Prefix60(key.cast("string")), lit(buckets))

  /** `conv(substring(md5(x),1,15),16,10)` as one native expression —
    * see [[graft.functions.expressions.Md5Prefix60]]. */
  def md5Prefix60(key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.Md5Prefix60(
      ColumnBridge.expression(key)))
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token count: runs of letters or digits (a cheap, portable
    * stand-in for a subword tokenizer's pre-tokenization pass). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0)))

  /** Canonical text for near-dup fingerprinting: lowercase, strip
    * non-alphanumerics, collapse whitespace. Native one-pass expression
    * — the two-regex composed form costs ~30µs/doc and join planning
    * evaluates the join key up to four times (null filter + projection,
    * both sides); see NormalizeAscii for the exact-equivalence note. */
  def normalized(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.NormalizeAscii(
      ColumnBridge.expression(text)))
  }

  /** Normalized-text fingerprint (md5 — portable to the oracle). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** English-ish stopword hit count over a word list. */
  def stopwordHits(ws: Column, stopwords: Seq[String]): Column =
    size(filter(ws, w => w.isin(stopwords.map(s => s: Any): _*)))

  /** Language-marker word sets for the n-gram/stopword language-ID
    * heuristic. Tie-break priority = declaration order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"))

  /** Stopword-hit language ID: per-language marker-hit counts and the
    * argmax guess (ties resolved by LangMarkers order). Returns the
    * input plus hits_<lang> columns and `guess`. */
  def withLangId(df: org.apache.spark.sql.DataFrame, text: String): org.apache.spark.sql.DataFrame = {
    val ws = words(col(text))
    val withHits = LangMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"hits_$lang", stopwordHits(ws, markers))
    }
    val best = greatest(LangMarkers.map { case (l, _) => col(s"hits_$l") }: _*)
    val guess = LangMarkers.foldRight(lit(LangMarkers.last._1)) {
      case ((lang, _), rest) => when(col(s"hits_$lang") === best, lit(lang)).otherwise(rest)
    }
    withHits.withColumn("guess", guess)
  }

  /** Quality features (length / vocabulary / stopword mix), combined into
    * a single [0,1]-ish score. All integer-derived arithmetic → exact
    * and engine-portable. */
  def qualityScore(nWords: Column, nDistinct: Column, stopHits: Column,
                   nChars: Column): Column = {
    val distinctRatio = nDistinct.cast("double") / nWords
    val stopRatio = stopHits.cast("double") / nWords
    val meanWordLen = nChars.cast("double") / nWords
    round(
      lit(0.4) * least(distinctRatio * 2.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 5.0, lit(1.0)) +
      lit(0.3) * least(meanWordLen / 8.0, lit(1.0)), 6)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines (language ID,
  * quality scoring, token counting, fingerprinting — builder brief), all as
  * native expression trees so they stay inside whole-stage codegen and
  * never leave the JVM. Every function here is a narrow (per-row) map —
  * no shuffles — so they scale linearly with input splits at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text; empty/null text → empty array
    * (Spark's `split("", ...)` would yield `[""]`, which poisons counts).
    */
  def tokens(c: Column): Column =
    when(c.isNull || trim(c) === "", array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count estimate: word-piece regex split — words,
    * numbers, and individual punctuation each count as a token (the
    * common `\w+|[^\w\s]` tokenizer).
    */
  def subwordCount(c: Column): Column =
    when(c.isNull, lit(0))
      .otherwise(size(regexp_extract_all(c, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0))))

  /** Ratio of tokens that appear in `stopwords` (0.0 when no tokens). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(lower(c))
    val sw   = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        size(filter(toks, t => array_contains(sw, t))).cast("double") /
          size(toks).cast("double"))
  }

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(c: Column): Column =
    when(c.isNull || length(c) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(c, "[^.,;:!?]", "")).cast("double") /
          length(c).cast("double"))

  /** Mean token length in characters (0.0 when no tokens). */
  def meanTokenLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks).cast("double"))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Heuristic document quality score in [0,1]: rewards a healthy length
    * (saturating at `targetTokens`), a natural stopword ratio, and a low
    * punctuation density. Deterministic, order-free, and expressible in
    * ANSI SQL for the oracle.
    */
  def qualityScore(c: Column, targetTokens: Int = 100): Column = {
    val lenScore  = least(tokenCount(c).cast("double") / targetTokens.toDouble, lit(1.0))
    val swScore   = least(stopwordRatio(c, EnglishStopwords) * 4.0, lit(1.0))
    val punctPen  = lit(1.0) - least(punctRatio(c) * 10.0, lit(1.0))
    round(lenScore * 0.4 + swScore * 0.3 + punctPen * 0.3, 6)
  }

  /** Language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Order = tie-break priority (first wins).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "vi" -> Seq("của", "và", "là", "không", "người"),
  )

  /** Stopword-profile language ID: argmax marker-token count over
    * [[LangMarkers]]; ties break in lexicon order; zero hits → "und".
    */
  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    val hits = LangMarkers.map { case (lang, markers) =>
      val mk = array(markers.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(mk, t)))
    }
    val best = greatest(hits.map(_._2): _*)
    // first language reaching the max wins (stable tie-break)
    hits.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, cnt)) =>
      acc.when(cnt === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Canonical-form content fingerprint: lowercase, strip non-alphanumerics,
    * collapse whitespace, md5. Survives case/punctuation/spacing edits —
    * the standard first-pass exact-dedup key for web corpora.
    */
  def contentFingerprint(c: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))
      .cast("binary"))

  /** Word n-gram shingles (arrays of `n` consecutive tokens joined by a
    * space); documents shorter than `n` tokens yield a single shingle of
    * the whole text so no row silently vanishes from dedup.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(lower(c))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }
}

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

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** All counters in one native pass ([[graft.plans.TextStats]]): the
    * HOF forms (`size(filter(...))`, `aggregate(...)`) evaluate one
    * interpreted closure per token per function — and re-evaluate the
    * whole forest per reference when Catalyst inlines them into a
    * pushed-down predicate (the q50 keep-policy filter measured 6× the
    * projection form before this).
    */
  /** Jaro–Winkler similarity ∈ [0,1] ([[graft.plans.JaroWinkler]] —
    * codegen; semantics pinned to DuckDB's
    * `jaro_winkler_similarity`): the record-linkage name comparator.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(graft.plans.JaroWinkler(
      ColumnBridge.expression(a.cast("string")),
      ColumnBridge.expression(b.cast("string"))))

  private def stats(c: Column): Column =
    ColumnBridge.column(graft.plans.TextStats(
      ColumnBridge.expression(c.cast("string")), withSubwords = false))
  private def stat(c: Column, field: String): Column =
    coalesce(stats(c).getField(field), lit(0L))
  private def statOf(s: Column, field: String): Column =
    coalesce(s.getField(field), lit(0L))

  /** The raw counter struct, for pipelines deriving several features
    * from one text column: materialize this ONCE as its own column
    * (Catalyst never collapses a multi-referenced non-trivial alias),
    * then derive with the `...From` variants — a pushed-down policy
    * predicate then reads struct fields instead of re-running the text
    * scan per inlined reference (filter codegen has no common-
    * subexpression elimination; q50 measured 6× before this).
    */
  def textStats(c: Column): Column = stats(c)

  /** [[tokenCount]] over a pre-computed [[textStats]] struct. */
  def tokenCountFrom(s: Column): Column = statOf(s, "n_tokens").cast("int")

  /** [[qualityScore]] over a pre-computed [[textStats]] struct — same
    * arithmetic, bit-identical result.
    */
  def qualityFrom(s: Column, targetTokens: Int = 100): Column = {
    val n = statOf(s, "n_tokens")
    val lenScore = least(n.cast("int").cast("double") / targetTokens.toDouble, lit(1.0))
    val swRatio = when(n === 0L, lit(0.0))
      .otherwise(statOf(s, "stop_quality").cast("double") / n.cast("double"))
    val swScore = least(swRatio * 4.0, lit(1.0))
    val nc = statOf(s, "n_chars")
    val pr = when(nc === 0L, lit(0.0))
      .otherwise(statOf(s, "punct_chars").cast("double") / nc.cast("double"))
    val punctPen = lit(1.0) - least(pr * 10.0, lit(1.0))
    round(lenScore * 0.4 + swScore * 0.3 + punctPen * 0.3, 6)
  }

  /** [[langId]] over a pre-computed [[textStats]] struct. */
  def langIdFrom(s: Column): Column = {
    val hits = LangMarkers.map { case (lang, _) =>
      lang -> statOf(s, s"hits_$lang").cast("int")
    }
    val best = greatest(hits.map(_._2): _*)
    hits.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, cnt)) =>
      acc.when(cnt === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Whitespace tokens of trimmed text; empty/null text → empty array
    * (Spark's `split("", ...)` would yield `[""]`, which poisons counts).
    */
  def tokens(c: Column): Column =
    when(c.isNull || trim(c) === "", array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = stat(c, "n_tokens").cast("int")

  /** BPE-ish subword count estimate: word-piece regex split — words,
    * numbers, and individual punctuation each count as a token (the
    * common `\w+|[^\w\s]` tokenizer).
    */
  def subwordCount(c: Column): Column =
    coalesce(
      ColumnBridge.column(graft.plans.TextStats(
        ColumnBridge.expression(c.cast("string")), withSubwords = true))
        .getField("n_subwords"),
      lit(0L)).cast("int")

  /** Ratio of tokens that appear in `stopwords` (0.0 when no tokens).
    * The [[EnglishStopwords]] set rides the native counter; arbitrary
    * sets take the generic (interpreted-HOF) path.
    */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column =
    if (stopwords == EnglishStopwords) {
      val n = stat(c, "n_tokens")
      when(n === 0L, lit(0.0))
        .otherwise(stat(c, "stop_quality").cast("double") / n.cast("double"))
    } else {
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
        stat(c, "punct_chars").cast("double") / stat(c, "n_chars").cast("double"))

  /** Mean token length in characters (0.0 when no tokens). */
  def meanTokenLen(c: Column): Column = {
    val n = stat(c, "n_tokens")
    when(n === 0L, lit(0.0))
      .otherwise(stat(c, "sum_token_len").cast("double") / n.cast("double"))
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
    val hits = LangMarkers.map { case (lang, _) =>
      lang -> stat(c, s"hits_$lang").cast("int")
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

  /** Unicode NFC canonicalization ([[graft.plans.NfcNormalize]], the
    * JVM's built-in normalizer — codegen'd, no UDF): run it BEFORE
    * [[contentFingerprint]]/shingling when a corpus mixes precomposed
    * and combining-mark encodings of the same visible text, or the
    * dedup families treat them as different documents.
    */
  def normalizeNfc(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.NfcNormalize(ColumnBridge.expression(c)))
  }

  /** Regex-level HTML boilerplate removal — the web-corpus ingest step
    * before any text analysis: script/style elements drop WITH their
    * content, comments and remaining tags drop, the six ubiquitous
    * character entities decode (`&amp;` LAST, so `&amp;lt;` correctly
    * yields the literal `&lt;` rather than double-decoding), and
    * whitespace collapses. Deliberately regex-level, not an HTML
    * parser: malformed nesting degrades to leaving text in place, never
    * to dropping it, which is the right failure mode for a corpus
    * filter. Every pattern is RE2-compatible (non-greedy + inline
    * flags, NO backreferences), so the DuckDB oracle runs the identical
    * chain.
    *
    * Executes as ONE native kernel ([[graft.plans.HtmlStrip]]: six
    * explicit scans, no regex engine, no intermediate per-pass
    * strings); [[stripHtmlComposed]] is the eleven-`regexp_replace`
    * reference chain the kernel is differentially proven against
    * (HtmlStripSpec) and the form the q110 oracle mirrors in SQL.
    */
  def stripHtml(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.HtmlStrip(ColumnBridge.expression(c)))
  }

  /** The composed reference form of [[stripHtml]] — semantics
    * documentation and differential-test target, not the production
    * path.
    */
  private[graft] def stripHtmlComposed(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    // entity names are regex-safe literals, so no quoting machinery
    // (RE2 has no \Q\E) — identical pattern strings run on both engines
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (e, r)) => regexp_replace(col0, e, r) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** URL canonicalization for URL-level dedup — the companion key to
    * [[contentFingerprint]] in a web corpus: trim, drop the fragment,
    * lowercase ONLY the scheme+authority (paths/queries are
    * case-significant), strip `utm_*` tracking parameters (query
    * separators re-tidied), and drop explicit default ports
    * (`:80`/`:443`). Scheme-less or malformed input passes through
    * with just the fragment/utm/trim rules — never nulled, so no URL
    * silently vanishes from the key space. Every rule is a group-free
    * RE2-compatible pattern (replacement backreference syntax differs
    * between Java and RE2, so none are used), and the authority
    * lowering is `regexp_extract` + `substr` arithmetic — the DuckDB
    * oracle runs the identical chain. Pure codegen'd built-ins.
    */
  def normalizeUrl(c: Column): Column = {
    // fragment first, trim second: dropping '#frag' can expose
    // trailing whitespace that the trim must still catch
    val noFrag = trim(regexp_replace(c, "(?s)#.*", ""))
    val pfx = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    // the extracted prefix ENDS at the authority, so $-anchored port
    // rules are naturally scoped to it — a ':80' in a path or query
    // (outside the prefix) is untouched
    val pfxCanon = regexp_replace(
      regexp_replace(lower(pfx), ":80$", ""), ":443$", "")
    val lowered = concat(pfxCanon,
      noFrag.substr(length(pfx) + lit(1), length(noFrag)))
    val utm1 = regexp_replace(lowered, "&utm_[a-z]+=[^&]*", "")
    val utm2 = regexp_replace(utm1, "\\?utm_[a-z]+=[^&]*&", "?")
    regexp_replace(utm2, "\\?utm_[a-z]+=[^&]*$", "")
  }

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

  /** Duplicate-line statistics (the Gopher-family repetition rules of
    * Rae et al. 2021 §A1.1): `string → struct<n_lines, distinct_lines,
    * dup_lines, line_chars, dup_line_chars : bigint>` where
    * `dup_line_chars` counts the characters of every line occurrence
    * BEYOND its first (the mass a line-level dedup would remove).
    *
    * Pure narrow map over codegen'd built-ins — `split` /
    * `array_distinct` / `array_join` are ordinary expressions, not
    * higher-order lambdas, so the whole struct rides the corpus scan
    * with no shuffle and no interpreted closure per line. Character
    * counts only need SET identity, not order, so
    * `length(array_join(array_distinct(...)))` is exact regardless of
    * which occurrence `array_distinct` keeps. NULL text → all fields
    * NULL.
    *
    * @param sep line separator, a LITERAL string (regex-escaped before
    *   it reaches `split`), default `"\n"`.
    */
  def dupLineStats(c: Column, sep: String = "\n"): Column = {
    val lines    = split(c, java.util.regex.Pattern.quote(sep), -1)
    val dlines   = array_distinct(lines)
    val nLines   = size(lines).cast("long")
    val nDistinct = size(dlines).cast("long")
    val lineChars = (length(c) - (size(lines) - 1) * sep.length).cast("long")
    val dupChars  = lineChars - length(array_join(dlines, "")).cast("long")
    struct(
      nLines.as("n_lines"),
      nDistinct.as("distinct_lines"),
      (nLines - nDistinct).as("dup_lines"),
      lineChars.as("line_chars"),
      dupChars.as("dup_line_chars"))
  }

  /** Intra-document line dedup: rebuild the text keeping only the FIRST
    * occurrence of each line — the excision companion to
    * [[dupLineStats]] (Gopher's repetition rules measure; this removes).
    * Spark's `array_distinct` preserves first-occurrence order, so the
    * whole rebuild is `array_join(array_distinct(split(...)))` — a
    * pure codegen narrow map riding the corpus scan. Note empty lines
    * dedup like any value here (the SECOND blank line goes), unlike
    * cross-doc [[graft.operators.Dedup.paragraphDedup]] where empties
    * are structure — intra-doc, repeated blanks ARE the redundancy.
    * NULL → NULL.
    */
  def dedupLines(c: Column, sep: String = "\n"): Column =
    array_join(
      array_distinct(split(c, java.util.regex.Pattern.quote(sep), -1)), sep)

  /** PII patterns, deliberately conservative regex subset (no lookaround,
    * no backrefs) so the same pattern strings run identically under
    * Java's engine here and RE2-family engines elsewhere — a corpus
    * scrubbed on Spark must report the same counts when audited by
    * another engine. Ordered: emails first (they contain dots that the
    * ip pattern could otherwise nibble at), then ips, then phones.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ip"    -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b")

  /** Redact all [[PiiPatterns]] occurrences to `<KIND>` placeholders.
    * Pure narrow map (chained codegen'd regexp_replace) — PII scrubbing
    * of a 100 TB corpus rides the scan, no shuffle.
    */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (kind, pat)) =>
      regexp_replace(acc, pat, s"<${kind.toUpperCase}>")
    }

  /** Occurrence count of one PII kind (key into [[PiiPatterns]]). */
  def piiCount(c: Column, kind: String): Column = {
    val pat = PiiPatterns.toMap.apply(kind)
    regexp_count(c, lit(pat)).cast("int")
  }
}

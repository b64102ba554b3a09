package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All text-analysis counters for one document in one pass:
  * `string → struct<n_tokens, n_subwords, punct_chars, n_chars,
  * sum_token_len, stop_quality, hits_en, hits_de, hits_fr, hits_es,
  * hits_vi: bigint>`.
  *
  * Why a custom Expression: the composed forms
  * (`size(filter(tokens, ...))`, `aggregate(tokens, ...)`) are
  * higher-order functions — CodegenFallback, one interpreted closure
  * dispatch per token per function, and when Catalyst inlines them
  * into a pushed-down *predicate* (q50's keep-policy filter) the whole
  * forest re-evaluates per reference. This computes every counter the
  * text family needs in one per-row call.
  *
  * Semantics are mirrored from the Column forms exactly
  * ([[graft.functions.TextFunctions]] documents the contract; the
  * differential test in TextFunctionsSpec and the q29/q30/q31/q37/q50
  * oracle hash-matches enforce it):
  *  - tokens: `trim` = UTF8String.trim (0x20 only, same as Spark's
  *    `trim`), then Java-regex `\s+` split (what Spark's `split` runs);
  *    blank/empty → zero tokens;
  *  - lengths in code points (Spark `length` = UTF8String.numChars);
  *  - stopword/lang-marker hits over tokens of
  *    `UTF8String.toLowerCase` (identical to Spark's `lower`);
  *  - subwords: Java-regex `[A-Za-z0-9_]+|[^A-Za-z0-9_\s]` match count
  *    over the raw text (Spark's `regexp_extract_all` engine).
  */
/** @param withSubwords the subword-regex pass is the expensive part
  *   and only [[graft.functions.TextFunctions.subwordCount]] reads it —
  *   everything else skips it (n_subwords = 0, never read).
  */
case class TextStats(child: Expression, withSubwords: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_text_stats requires string, got $t")
    }

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "graft_text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], withSubwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.TextStats.compute($a, $withSubwords);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  val schema: StructType = StructType(Seq(
    "n_tokens", "n_subwords", "punct_chars", "n_chars", "sum_token_len",
    "stop_quality", "hits_en", "hits_de", "hits_fr", "hits_es", "hits_vi")
    .map(StructField(_, LongType, nullable = false)))

  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val Subword = java.util.regex.Pattern.compile("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]")

  // lexicons duplicated from TextFunctions (which asserts equality in
  // its spec so the two can't drift)
  private val StopQuality = Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  private val En = Set("the", "a", "of", "and", "is")
  private val De = Set("der", "die", "das", "und", "ist")
  private val Fr = Set("le", "la", "les", "et", "est")
  private val Es = Set("el", "los", "las", "y", "es")
  private val Vi = Set("của", "và", "là", "không", "người")

  // One-entry per-thread memo: Catalyst inlines this expression once
  // per *reference* when a predicate pushes down (filter codegen has no
  // common-subexpression elimination), so one row's text may be
  // recomputed ~8×. Consecutive calls see the same bytes — memoize on a
  // defensive copy (the incoming UTF8String can view a reused buffer).
  // Pure function, byte-wise key: results are identical with or without
  // the memo.
  private val lastKey = new ThreadLocal[(UTF8String, Boolean)]
  private val lastVal = new ThreadLocal[InternalRow]

  def compute(text: UTF8String, withSubwords: Boolean): InternalRow = {
    val k = lastKey.get
    if (k != null && k._2 == withSubwords && k._1.equals(text)) return lastVal.get
    val result = computeUncached(text, withSubwords)
    lastKey.set((text.clone(), withSubwords))
    lastVal.set(result)
    result
  }

  private def computeUncached(text: UTF8String, withSubwords: Boolean): InternalRow = {
    val raw = text.toString
    val nChars = raw.codePointCount(0, raw.length)

    var punct = 0L
    var i = 0
    while (i < raw.length) {
      raw.charAt(i) match {
        case '.' | ',' | ';' | ':' | '!' | '?' => punct += 1
        case _ => ()
      }
      i += 1
    }

    var nSub = 0L
    if (withSubwords) {
      val m = Subword.matcher(raw)
      while (m.find()) nSub += 1
    }

    val trimmed = text.trim().toString
    var nTokens = 0L
    var sumLen = 0L
    if (trimmed.nonEmpty) {
      val toks = Ws.split(trimmed, -1)
      nTokens = toks.length.toLong
      var j = 0
      while (j < toks.length) {
        sumLen += toks(j).codePointCount(0, toks(j).length)
        j += 1
      }
    }

    var stopQ, en, de, fr, es, vi = 0L
    val trimmedLower = text.toLowerCase.trim().toString
    if (trimmedLower.nonEmpty) {
      val ltoks = Ws.split(trimmedLower, -1)
      var j = 0
      while (j < ltoks.length) {
        val t = ltoks(j)
        if (StopQuality.contains(t)) stopQ += 1
        if (En.contains(t)) en += 1
        if (De.contains(t)) de += 1
        if (Fr.contains(t)) fr += 1
        if (Es.contains(t)) es += 1
        if (Vi.contains(t)) vi += 1
        j += 1
      }
    }

    InternalRow(nTokens, nSub, punct, nChars.toLong, sumLen, stopQ, en, de, fr, es, vi)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Excise token spans from one document in one pass:
  * `(text, array<struct<span_start, span_end>>) →
  * struct<text_deduped: string, n_tokens_removed: long>` — the
  * assembly kernel of [[graft.operators.SubstringDedup.cutSpans]].
  * Tokens at 1-based positions covered by any span are dropped; the
  * survivors re-join with single spaces (original casing and order,
  * inter-token whitespace normalised — byte-identical to the
  * `array_join(tokens, ' ')` convention of the composed form).
  *
  * Why a custom Expression: the composed cut was
  * `transform`/`filter`/`exists` higher-order functions, which Spark
  * evaluates via interpreted lambdas — the ~20 µs/element pattern the
  * repo measured in round 1 and replaced with native kernels on every
  * other hot path (ShingleHashes, HashedBowScore, …). The excision
  * pass sits on every document of a real dedup run at O(tokens ×
  * spans) per doc; this kernel tokenizes once, merges the spans into
  * disjoint sorted intervals (O(s log s)), and sweeps the tokens with
  * one pointer (O(tokens + s)) inside whole-stage codegen.
  *
  * Null/edge contract — replicated from the HOF form exactly
  * (differential-tested in CutSpansSpec, so q91/q94's oracles are
  * unchanged):
  *  - NULL or blank text tokenizes to the empty array
  *    ([[graft.functions.TextFunctions.tokens]]): result `("", 0)`.
  *  - NULL span array (a doc with no spans after the left join) cuts
  *    nothing.
  *  - a NULL span row or NULL bound engages SQL three-valued logic in
  *    the HOF's `exists`: a token is kept iff EVERY span's covered
  *    predicate is exactly FALSE (`false && null = false`, so e.g.
  *    `(p >= 2) && (p <= NULL)` is false for p = 1 and null for
  *    p ≥ 2 — kept and dropped respectively). The kernel switches to
  *    an exact 3VL evaluation when any null is present (producers
  *    never emit null spans; the case is pinned so the kernel cannot
  *    silently diverge).
  *  - an inverted span (end < start) covers nothing.
  */
case class CutSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.fields.length == 2 &&
            s.fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cut_spans requires (string, array<struct<long,long>>), got ($l, $r)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("text_deduped", StringType, nullable = false),
    StructField("n_tokens_removed", LongType, nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "graft_cut_spans"

  override def eval(input: InternalRow): Any =
    CutSpans.compute(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val t = ctx.freshName("cutText")
    val s = ctx.freshName("cutSpans")
    ev.copy(
      code = code"""
        ${leftGen.code}
        ${rightGen.code}
        org.apache.spark.unsafe.types.UTF8String $t =
          ${leftGen.isNull} ? null : ${leftGen.value};
        org.apache.spark.sql.catalyst.util.ArrayData $s =
          ${rightGen.isNull} ? null : ${rightGen.value};
        InternalRow ${ev.value} = graft.plans.CutSpans.compute($t, $s);
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpans =
    copy(left = newLeft, right = newRight)
}

object CutSpans {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, spans: ArrayData): InternalRow = {
    val toks: Array[String] =
      if (text == null) Array.empty[String]
      else {
        val trimmed = text.trim().toString
        if (trimmed.isEmpty) Array.empty[String] else Ws.split(trimmed, -1)
      }
    val n = toks.length
    val nSpans = if (spans == null) 0 else spans.numElements()

    // collect valid (start, end) pairs; any null row or bound routes
    // to the exact three-valued-logic path (see scaladoc)
    val starts = new Array[Long](nSpans)
    val ends = new Array[Long](nSpans)
    var m = 0
    var i = 0
    while (i < nSpans) {
      if (spans.isNullAt(i)) return computeWithNulls(toks, spans)
      val row = spans.getStruct(i, 2)
      if (row.isNullAt(0) || row.isNullAt(1)) return computeWithNulls(toks, spans)
      val a = row.getLong(0); val b = row.getLong(1)
      if (a <= b && b >= 1 && a <= n) { starts(m) = math.max(a, 1L); ends(m) = b; m += 1 }
      i += 1
    }

    if (n == 0) return result("", 0L)
    if (m == 0) return result(String.join(" ", toks: _*), 0L)

    // sort the valid intervals by start (insertion sort — span lists
    // are small) and sweep the tokens with one pointer
    var x = 1
    while (x < m) {
      val sa = starts(x); val ea = ends(x)
      var y = x - 1
      while (y >= 0 && starts(y) > sa) {
        starts(y + 1) = starts(y); ends(y + 1) = ends(y); y -= 1
      }
      starts(y + 1) = sa; ends(y + 1) = ea
      x += 1
    }

    val sb = new java.lang.StringBuilder(
      if (text == null) 16 else text.numBytes())
    var kept = 0
    var si = 0
    var coverEnd = 0L // furthest end among intervals already passed
    var p = 1
    while (p <= n) {
      while (si < m && starts(si) <= p) {
        if (ends(si) > coverEnd) coverEnd = ends(si)
        si += 1
      }
      if (p > coverEnd) {
        if (kept > 0) sb.append(' ')
        sb.append(toks(p - 1))
        kept += 1
      }
      p += 1
    }
    result(sb.toString, (n - kept).toLong)
  }

  /** Exact 3VL replica of `!exists(spans, sp -> p >= a && p <= b)` for
    * span lists containing null rows or bounds: a token survives iff
    * EVERY span's covered predicate is exactly FALSE (`!NULL` is NULL,
    * which `filter` treats as drop). Codes: 0 = false, 1 = true,
    * 2 = null.
    */
  private def computeWithNulls(toks: Array[String], spans: ArrayData): InternalRow = {
    val n = toks.length
    val nSpans = spans.numElements()
    val sb = new java.lang.StringBuilder()
    var kept = 0
    var p = 1
    while (p <= n) {
      var ex: Int = 0 // exists accumulator: false
      var i = 0
      while (i < nSpans && ex != 1) {
        val c: Int =
          if (spans.isNullAt(i)) 2
          else {
            val row = spans.getStruct(i, 2)
            val geA: Int =
              if (row.isNullAt(0)) 2 else if (p >= row.getLong(0)) 1 else 0
            val leB: Int =
              if (row.isNullAt(1)) 2 else if (p <= row.getLong(1)) 1 else 0
            if (geA == 0 || leB == 0) 0
            else if (geA == 2 || leB == 2) 2
            else 1
          }
        if (c == 1) ex = 1 else if (c == 2 && ex == 0) ex = 2
        i += 1
      }
      if (ex == 0) {
        if (kept > 0) sb.append(' ')
        sb.append(toks(p - 1))
        kept += 1
      }
      p += 1
    }
    result(sb.toString, (n - kept).toLong)
  }

  private def result(text: String, removed: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(text), removed))
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-point base-2 logarithm `floor(log2(n) * 2^10)` of a positive
  * long, as a whole-stage-codegen expression — the COLUMN form of
  * [[graft.operators.Dsir.log2Fp]]'s driver-side scalar (bit-identical
  * by construction: same Q30 normalization, same 10 squarings; the
  * Log2FpSpec sweep pins the equality). The DSIR fit could afford a
  * driver loop because its log arguments are a ≤`2×dim` collected
  * count table; BM25's arguments are per-TERM document frequencies —
  * vocabulary-sized, so the log must run where the vocabulary lives,
  * inside codegen, not on the driver.
  *
  * Determinism is the point: IEEE `ln`/`log2` differ between libms in
  * the last ulp, and a hash-matched oracle cannot tolerate "almost".
  * This expression is pure integer arithmetic, reproduced in DuckDB as
  * the same 10-step recursive CTE the q113 oracle already uses.
  *
  * NULL → NULL; `n < 1` throws (a frequency/count of 0 reaching a log
  * is a caller bug — the BM25 idf arguments `2N+2` and `2df+1` are
  * ≥ 1 by construction, and silently clamping would mask a broken
  * upstream aggregate).
  */
case class Log2Fp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_log2fp requires a bigint argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_log2fp"

  override protected def nullSafeEval(input: Any): Any =
    Log2Fp.log2Fp(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Log2Fp.log2Fp($c);")

  override protected def withNewChildInternal(newChild: Expression): Log2Fp =
    copy(child = newChild)
}

object Log2Fp {

  /** Fractional bits (10, matching `Dsir.FracBits`): values are in
    * units of 2^-10 ≈ 0.001 log2.
    */
  val FracBits = 10

  /** `floor(log2(n) * 2^10)`: normalize to Q30 ∈ [2^30, 2^31), then
    * one squaring per fractional bit (square ∈ [2^60, 2^62) — no
    * signed-64 overflow); each square crossing 2^31 emits a 1 bit and
    * renormalizes. Static and JIT-friendly so codegen calls it
    * directly.
    */
  def log2Fp(n: Long): Long = {
    if (n < 1L) throw new IllegalArgumentException(
      s"graft_log2fp needs n >= 1, got $n")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = if (m <= 30) n << (30 - m) else n >> (m - 30)
    var r = m.toLong
    var i = 0
    while (i < FracBits) {
      x = (x * x) >> 30
      if (x >= (1L << 31)) { x >>= 1; r = r * 2 + 1 }
      else r *= 2
      i += 1
    }
    r
  }
}

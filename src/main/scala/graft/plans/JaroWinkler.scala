package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990) over two strings → double in
  * [0, 1] — the name-comparison standard of the record-linkage
  * literature, which Spark lacks natively ([[LongArrayDot]] rationale:
  * this sits inside the candidate-pair loop, so it must stay in
  * whole-stage codegen, not a Scala udf).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the oracle
  * — JaroWinklerSpec cross-checks a case battery and q156 hash-checks
  * the full table): either side empty → 0.0; match window
  * `max(len)/2 − 1`; half-transposition count; Winkler prefix boost
  * (≤ 4 chars, scale 0.1) applied ONLY when jaro > 0.7;
  * case-sensitive; UTF-16 code units (equivalent to the oracle's
  * comparison for the ASCII keys linkage runs on — documented limit,
  * like [[NfcNormalize]]'s).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires two strings, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinkler.sim($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static scalar (JIT-friendly; codegen calls it directly — the
    * [[Log2Fp]] pattern). Two-pass: greedy windowed matching, then
    * half-transposition count over the matched subsequences.
    */
  def sim(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    // the oracle (DuckDB / rapidfuzz-lineage) FLOORS the
    // half-transposition count to an integer — (m − t/2) with t/2
    // as integer division, not the literature's t/2.0 (an odd crossing
    // count rounds DOWN, slightly raising the score; pinned by the
    // 'XX000871' case in JaroWinklerSpec)
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}

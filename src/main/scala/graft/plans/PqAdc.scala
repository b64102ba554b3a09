package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** ADC scoring: sum of per-subspace lookup-table entries —
  * `(codes: array<int>[m], table: array<long>[m·k]) → bigint`, the
  * approximate squared distance `Σ_sub table[sub·k + codes[sub]]`
  * between the table's query and the codes' document (exact distance
  * to the document's PQ reconstruction — see [[PqDistTable]]).
  *
  * This is the innermost loop of PQ search (pairs × m), so it gets
  * the [[LongArrayDot]] treatment: a tight primitive loop inside
  * whole-stage codegen instead of an interpreted higher-order fold.
  * `m`/`k` embed as literals so the generated code bounds-checks
  * codes against the real codebook shape.
  *
  * Contract: NULL inputs → NULL; a codes array whose length ≠ m, a
  * table whose length ≠ m·k, a NULL element, or an out-of-range code
  * → NULL (never a wrong sum — the [[LongArrayDot]] ADVICE-r01 rule).
  */
case class PqAdc(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  require(m >= 1 && k >= 1, "need m, k >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires (array<int>, array<bigint>), got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    if (codes.numElements() != m || table.numElements() != m * k) return null
    var s = 0L
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= k) return null
      if (table.isNullAt(i * k + c)) return null
      s += table.getLong(i * k + c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $m || $b.numElements() != ${m * k}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $c = $a.getInt($i);
         |    if ($c < 0 || $c >= $k || $b.isNullAt($i * $k + $c)) { ${ev.isNull} = true; break; }
         |    $s += $b.getLong($i * $k + $c);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

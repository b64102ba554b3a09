package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of positions where two `array<long>` columns agree — the
  * MinHash signature-agreement kernel: `est_jaccard = eqCount(sigA,
  * sigB) / numHashes` runs once per CANDIDATE PAIR, and candidate
  * pairs at corpus scale are orders of magnitude more numerous than
  * documents. The built-in form `size(filter(zip_with(a, b, _===_),
  * p => p))` is two nested higher-order functions — CodegenFallback,
  * interpreted, allocating an intermediate boolean array per pair.
  * This expression is a tight primitive loop inside whole-stage
  * codegen (same escape-hatch rationale as [[LongArrayDot]]).
  *
  * NULL contract mirrors the HOF form it replaces: NULL input → NULL;
  * mismatched lengths → NULL (zip_with would pad and the padded
  * positions compare NULL — never equal — but a ragged signature pair
  * is a caller bug, surfaced as NULL not a silent undercount); NULL
  * elements never count as equal.
  */
case class LongArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_eq_count requires two array<bigint> arguments, got $l and $r")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_eq_count"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $c = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $c++;
         |  }
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayEqCount =
    copy(left = newLeft, right = newRight)
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two `array<long>` columns.
  *
  * Why a custom Expression (SURVEY.md §7.3 escape hatch): the built-in
  * form `aggregate(zip_with(a, b, _*_), 0L, _+_)` is a higher-order
  * function — `CodegenFallback`, evaluated interpreted, with a
  * per-element closure dispatch. On the near-dup/top-k pair joins this
  * is the innermost loop (pairs × dim). This expression generates a
  * tight primitive `long` loop inside whole-stage codegen — no
  * allocation, no boxing, no virtual calls.
  *
  * Used by the fixed-point similarity path
  * ([[graft.functions.VectorFunctions.dotQ]]); exact integer semantics
  * are what make the DuckDB oracle hash-stable, so this must stay
  * bit-equivalent to the interpreted form (asserted in
  * LongArrayDotSpec).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual check (ExpectsInputTypes' AbstractDataType is private[sql])
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dotq requires two array<bigint> arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotq"

  // NULL result on length mismatch / null elements (not just null inputs),
  // so nullable even over non-null children.
  override def nullable: Boolean = true

  /** Mirrors the interpreted `aggregate(zip_with(a,b,_*_),0L,_+_)` form
    * exactly: `zip_with` pads the shorter array with NULLs and a NULL
    * element NULL-propagates through the running sum, so mismatched
    * lengths or any NULL element yield a NULL dot product (not a
    * silently-truncated one — ADVICE r01).
    */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

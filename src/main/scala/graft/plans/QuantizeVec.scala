package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fixed-point quantization `array<double> → array<long>`:
  * element-wise `floor(x · 10⁶)` cast to long — the vector analogue of
  * the cents trick (SparkEntry scaladoc), turning float cosine math into
  * exact integer arithmetic.
  *
  * Why a custom Expression: the built-in form
  * `transform(v, x => floor(x * 1e6).cast("long"))` is a higher-order
  * function — CodegenFallback, interpreted per element with a closure
  * dispatch. Quantization runs once per corpus row in every similarity
  * query (q25/q26/q36 and the IVF/LSH index builds), so it sits on the
  * scan's hot path. This generates a primitive long[] loop inside
  * whole-stage codegen.
  *
  * Element semantics match the transform form exactly (asserted in
  * LongArrayDotSpec): `Math.floor` then a saturating long cast — the
  * same operation Spark's `Floor(double): long` performs; NULL elements
  * stay NULL; NULL input → NULL.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_quantize requires array<double>, got $t")
    }
  override def dataType: DataType =
    ArrayType(LongType, child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "graft_quantize"

  private def childContainsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (childContainsNull) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          out(i) = math.floor(arr.getDouble(i) * 1e6).toLong
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = math.floor(arr.getDouble(i) * 1e6).toLong; i += 1 }
      ArrayData.toArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      if (childContainsNull) {
        // boxed path only when the schema admits null elements
        s"""
           |int $n = $a.numElements();
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i)) {
           |    $out[$i] = (Object) (Long) (long) java.lang.Math.floor($a.getDouble($i) * 1.0E6);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      } else {
        s"""
           |int $n = $a.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (long) java.lang.Math.floor($a.getDouble($i) * 1.0E6);
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

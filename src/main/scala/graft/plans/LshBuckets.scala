package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All hyperplane-LSH bucket assignments for one vector in one pass:
  * `array<double>[dim] → array<int>[tables]`, where bucket bit `b` of
  * table `t` is the sign of the *fixed-point* dot
  * `Σ_d floor(v(d)·2^20) · floor(planes(t)(b)(d)·2^20)`.
  *
  * Why a custom Expression: the composed form — `tables × bits`
  * separate literal-plane dot products OR an explode + broadcast-join
  * matrix multiply — either blows past the JIT's method-size budget
  * (64 inlined loops in one projection) or shuffles `N·dim·tables·bits`
  * intermediate rows through two hash aggregates. This is one tight
  * triple loop over a `long[][][]` reference object, well inside
  * whole-stage codegen, making bucket assignment a pure narrow map at
  * any scale.
  *
  * Why fixed-point: a double accumulation's sign can depend on summation
  * order near zero, so bucket identity would be engine- and
  * fusion-order-dependent. Quantizing both operands to 2^20 (|v|,|coef|
  * ≲ 8 ⇒ products < 2^46, 4096-dim sums < 2^58 — no overflow) makes
  * every bucket an exact integer fact any engine reproduces — the
  * DuckDB oracle recomputes q27's buckets from the same quantized plane
  * literals. The hashing quality is untouched (hyperplanes are random;
  * perturbing them by 2^-20 is another random hyperplane).
  *
  * Contract: vectors that can't be scored — wrong length or a NULL
  * element — get the all-ones fallback bucket in every table (rows must
  * never vanish from the index); NULL input → NULL (callers coalesce).
  * Plane values are embedded in the plan (deterministic seed upstream,
  * [[graft.operators.Similarity.lshBucketsDf]]), so the expression is
  * retry-stable and canonicalizable (`planes` is a Seq, value equality).
  */
case class LshBuckets(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.head.nonEmpty && planes.head.head.nonEmpty,
    "planes must be (tables × bits × dim), all non-empty")
  require(planes.head.length <= 30, "bits must fit an int bucket")

  private val tables = planes.length
  private val bits = planes.head.length
  private val dim = planes.head.head.length
  private val fallbackBucket = (1 << bits) - 1

  @transient private lazy val mat: Array[Array[Array[Long]]] =
    planes.map(_.map(_.map(LshBuckets.quant).toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_buckets requires array<double>, got $t")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](tables)
    var bad = v.numElements() != dim
    var i = 0
    while (!bad && i < dim) { if (v.isNullAt(i)) bad = true; i += 1 }
    if (bad) {
      java.util.Arrays.fill(out, fallbackBucket)
    } else {
      val x = new Array[Long](dim)
      var d0 = 0
      while (d0 < dim) {
        x(d0) = math.floor(v.getDouble(d0) * LshBuckets.Scale).toLong
        d0 += 1
      }
      var t = 0
      while (t < tables) {
        var bucket = 0
        var b = 0
        while (b < bits) {
          val p = mat(t)(b)
          var s = 0L
          var d = 0
          while (d < dim) { s += x(d) * p(d); d += 1 }
          if (s >= 0L) bucket |= (1 << b)
          b += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("lshPlanes", mat, "long[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val bucket = ctx.freshName("bucket")
      s"""
         |int[] $out = new int[$tables];
         |boolean $bad = $a.numElements() != $dim;
         |for (int $i = 0; !$bad && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) $bad = true;
         |}
         |if ($bad) {
         |  java.util.Arrays.fill($out, $fallbackBucket);
         |} else {
         |  long[] $x = new long[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $x[$i] = (long) java.lang.Math.floor($a.getDouble($i) * ${LshBuckets.Scale}.0);
         |  }
         |  for (int $t = 0; $t < $tables; $t++) {
         |    int $bucket = 0;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      long[] $p = $matRef[$t][$b];
         |      long $s = 0L;
         |      for (int $d = 0; $d < $dim; $d++) { $s += $x[$d] * $p[$d]; }
         |      if ($s >= 0L) $bucket |= (1 << $b);
         |    }
         |    $out[$t] = $bucket;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** Fixed-point scale 2^20 for both the vector and the plane
    * coefficients — shared with the SQL oracle's quantization.
    */
  val Scale: Long = 1L << 20

  /** Quantize one plane coefficient — the oracle embeds exactly these
    * longs as literals.
    */
  def quant(c: Double): Long = math.floor(c * Scale).toLong
}

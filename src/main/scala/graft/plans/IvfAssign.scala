package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Nearest-centroid id for one pre-quantized vector against an embedded
  * codebook: `array<long>[dim] → int`, maximizing the same fixed-point
  * cosine as [[graft.functions.VectorFunctions.cosineFromQuantized]]
  * (`0.0` when either squared norm is zero, else
  * `dot / (sqrt(n2v) * sqrt(n2c))` in doubles), ties to the LOWEST
  * centroid id (strictly-greater keeps the first maximum — the
  * `ORDER BY sim DESC, centroid_id ASC` contract of the SQL oracle).
  *
  * Why a custom Expression (same rationale as [[LshBuckets]]): the
  * composed form — nCentroids separate literal-vector dot products
  * folded through array_max/array_position — inlines nCentroids dot
  * loops into one generated projection method, blowing past the JIT's
  * method-size budget, after which the hot map runs as interpreted
  * bytecode. This is one tight double loop over a `long[][]` reference
  * object, well inside whole-stage codegen: assignment stays a pure
  * narrow map at any scale (no join, no row amplification, no
  * aggregate).
  *
  * Contract: NULL vector → NULL; a vector of the wrong length or with a
  * NULL element is unscorable → NULL (callers filter, as the join form
  * did). The codebook embeds in the plan as value-equal Seqs, so the
  * expression is retry-stable and canonicalizable.
  */
case class IvfAssign(child: Expression, codebook: Seq[Seq[Long]], norms: Seq[Long])
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.head.nonEmpty,
    "codebook must be (nCentroids × dim), non-empty")
  require(codebook.length == norms.length, "one squared norm per centroid")

  private val k = codebook.length
  private val dim = codebook.head.length

  @transient private lazy val mat: Array[Array[Long]] =
    codebook.map(_.toArray).toArray
  @transient private lazy val n2s: Array[Long] = norms.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_ivf_assign requires array<bigint>, got $t")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ivf_assign"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val x = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = v.getLong(i)
      i += 1
    }
    var vn2 = 0L
    var d0 = 0
    while (d0 < dim) { vn2 += x(d0) * x(d0); d0 += 1 }
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val sim = if (vn2 == 0L || n2s(c) == 0L) 0.0 else {
        val cv = mat(c)
        var dot = 0L
        var d = 0
        while (d < dim) { dot += x(d) * cv(d); d += 1 }
        dot.toDouble / (math.sqrt(vn2.toDouble) * math.sqrt(n2s(c).toDouble))
      }
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("ivfCodebook", mat, "long[][]")
    val n2Ref = ctx.addReferenceObj("ivfNorms", n2s, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val vn2 = ctx.freshName("vn2")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val cv = ctx.freshName("cv")
      s"""
         |boolean $bad = $a.numElements() != $dim;
         |long[] $x = $bad ? null : new long[$dim];
         |for (int $i = 0; !$bad && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; } else { $x[$i] = $a.getLong($i); }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $vn2 = 0L;
         |  for (int $i = 0; $i < $dim; $i++) { $vn2 += $x[$i] * $x[$i]; }
         |  int $best = -1;
         |  double $bestSim = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $sim;
         |    if ($vn2 == 0L || $n2Ref[$c] == 0L) {
         |      $sim = 0.0;
         |    } else {
         |      long[] $cv = $matRef[$c];
         |      long $dot = 0L;
         |      for (int $d = 0; $d < $dim; $d++) { $dot += $x[$d] * $cv[$d]; }
         |      $sim = ((double) $dot) /
         |        (java.lang.Math.sqrt((double) $vn2) * java.lang.Math.sqrt((double) $n2Ref[$c]));
         |    }
         |    if ($sim > $bestSim) { $bestSim = $sim; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}

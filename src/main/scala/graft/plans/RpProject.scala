package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Johnson–Lindenstrauss random projection for one vector in one pass:
  * `array<double>[dim] → array<long>[outDim]`, where
  * `y_j = Σ_d s_{j,d} · ⌊x_d·10⁶⌋` and `s_{j,d} ∈ {+1, −1}` is the
  * parity of the auditable hash `h60("rp:j:d")` (Achlioptas,
  * "Database-friendly random projections", JCSS 2003: ±1 entries
  * satisfy the JL lemma like Gaussians — and unlike Gaussians they
  * keep the projection EXACT INTEGER arithmetic, so every projected
  * coordinate is an engine-neutral fact the DuckDB oracle re-derives
  * from the same literal-string hashes; no plane literals ship at
  * all).
  *
  * Why a custom Expression: same reasons as [[LshBuckets]] — the
  * composed form is either `outDim` inlined dot-product lambdas (JIT
  * method-budget blowup) or an explode-join matrix multiply (N·dim·
  * outDim shuffled rows); this is one tight double loop over a
  * `long[][]` reference object inside whole-stage codegen, a pure
  * narrow map at any scale.
  *
  * Sign convention is embedded in the loop, not a stored matrix — the
  * `long[][]` here is ±1s PRECOMPUTED driver-side from
  * [[graft.operators.RandomProjection.signs]] so the hot loop is a
  * multiply-accumulate with no hashing per row.
  *
  * Bounds: |x_d| ≤ X ⇒ |q_d| ≤ X·10⁶ and |y_j| ≤ dim·X·10⁶ — the
  * PROJECTION itself is overflow-safe far beyond any real dial
  * (|y_j| < 2^38 even at X=8, dim=4096). The hazard is DOWNSTREAM
  * squaring: `projDistSq`/`dotQ` over projected coordinates computes
  * Σ_j y_j² ≤ outDim·(dim·X·10⁶)², which overflows signed-64 already
  * at X=1, dim≈1500 — [[graft.operators.RandomProjection.topKProjected]]
  * enforces the exact envelope with a `require` on (outDim, dim,
  * maxAbs), and ANSI mode is the loud backstop for callers squaring
  * projections on their own.
  *
  * Contract (the ANN-family drop rule): wrong length or a NULL element
  * → NULL output (an unscorable vector cannot fake a projection;
  * callers drop or fall back explicitly). NULL input → NULL.
  */
case class RpProject(child: Expression, signs: Seq[Seq[Long]])
    extends UnaryExpression {

  require(signs.nonEmpty && signs.head.nonEmpty, "signs must be (outDim × dim)")
  require(signs.forall(row => row.length == signs.head.length &&
    row.forall(s => s == 1L || s == -1L)), "signs must be rectangular ±1")

  private val outDim = signs.length
  private val dim = signs.head.length

  @transient private lazy val mat: Array[Array[Long]] =
    signs.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_rp_project requires array<double>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rp_project"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val x = new Array[Long](dim)
    var d0 = 0
    while (d0 < dim) {
      x(d0) = math.floor(v.getDouble(d0) * 1e6).toLong
      d0 += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      val row = mat(j)
      var s = 0L
      var d = 0
      while (d < dim) { s += x(d) * row(d); d += 1 }
      out(j) = s
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("rpSigns", mat, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      s"""
         |boolean $bad = $a.numElements() != $dim;
         |for (int $i = 0; !$bad && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) $bad = true;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $x = new long[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $x[$i] = (long) java.lang.Math.floor($a.getDouble($i) * 1.0E6);
         |  }
         |  long[] $out = new long[$outDim];
         |  for (int $j = 0; $j < $outDim; $j++) {
         |    long[] $row = $matRef[$j];
         |    long $s = 0L;
         |    for (int $d = 0; $d < $dim; $d++) { $s += $x[$d] * $row[$d]; }
         |    $out[$j] = $s;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RpProject =
    copy(child = newChild)
}

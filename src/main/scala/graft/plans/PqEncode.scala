package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization encoder (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): one pre-quantized vector
  * `array<long>[dim]` → `array<int>[m]` of per-subspace code ids. The
  * vector splits into `m` contiguous subvectors of `dim/m` dims; each
  * picks the codebook entry minimizing the EXACT integer squared
  * distance `n2c − 2·dot + n2v` (the `n2v` term is constant per
  * subspace per row, so the loop minimizes `n2c − 2·dot`), ties to the
  * LOWEST code id — the SQL oracle's `ORDER BY d2 ASC, code ASC`.
  *
  * Why a custom Expression (the [[IvfAssign]] rationale): the composed
  * form is m·k literal-vector dot products folded through argmin —
  * inlined into one generated method it blows the JIT budget and falls
  * back to interpreted bytecode. Here it is one tight `long[][]` loop,
  * m·k·(dim/m) = k·dim integer multiplies per row, well inside
  * whole-stage codegen: encoding stays a pure narrow map at any corpus
  * size — the property that makes PQ the 100 TB path (codes are
  * dim/m·(bytes per float)·(32/ceil(log2 k)) ≈ 32× smaller than the
  * raw embedding column, so every downstream scan reads 32× less).
  *
  * Codebook layout: row `sub*k + code` holds that subspace-centroid's
  * quantized subvector (`dim/m` longs). Contract: NULL vector → NULL;
  * wrong length or NULL element → NULL (callers filter). The codebook
  * embeds as value-equal Seqs — retry-stable and canonicalizable.
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Long]], m: Int)
    extends UnaryExpression {

  require(m >= 1, "need at least one subspace")
  require(codebook.nonEmpty && codebook.length % m == 0,
    "codebook must be (m*k) rows")
  private val k = codebook.length / m
  private val subDim = codebook.head.length
  private val dim = subDim * m
  require(codebook.forall(_.length == subDim),
    "all codebook rows must share the subspace dim")

  @transient private lazy val mat: Array[Array[Long]] =
    codebook.map(_.toArray).toArray
  @transient private lazy val n2s: Array[Long] =
    mat.map(row => row.map(x => x * x).sum)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode requires array<bigint>, got $t")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

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
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var best = 0
      var bestScore = Long.MaxValue
      var c = 0
      while (c < k) {
        val cv = mat(s * k + c)
        var dot = 0L
        var d = 0
        while (d < subDim) { dot += x(base + d) * cv(d); d += 1 }
        val score = n2s(s * k + c) - 2L * dot
        if (score < bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("pqCodebook", mat, "long[][]")
    val n2Ref = ctx.addReferenceObj("pqNorms", n2s, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val cv = ctx.freshName("cv")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val base = ctx.freshName("base")
      s"""
         |boolean $bad = $a.numElements() != $dim;
         |long[] $x = $bad ? null : new long[$dim];
         |for (int $i = 0; !$bad && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; } else { $x[$i] = $a.getLong($i); }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $base = $s * $subDim;
         |    int $best = 0;
         |    long $bestScore = Long.MAX_VALUE;
         |    for (int $c = 0; $c < $k; $c++) {
         |      long[] $cv = $matRef[$s * $k + $c];
         |      long $dot = 0L;
         |      for (int $d = 0; $d < $subDim; $d++) { $dot += $x[$base + $d] * $cv[$d]; }
         |      long $score = $n2Ref[$s * $k + $c] - 2L * $dot;
         |      if ($score < $bestScore) { $bestScore = $score; $best = $c; }
         |    }
         |    $out[$s] = $best;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

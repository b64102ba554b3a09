package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Asymmetric-distance lookup table for PQ search (the ADC half of
  * Jégou et al. 2011): one pre-quantized QUERY vector
  * `array<long>[dim]` → `array<long>[m·k]` where slot `sub*k + code`
  * is the EXACT integer squared distance between the query's
  * subvector and that subspace centroid:
  * `n2q_sub + n2c − 2·dot`. A candidate's approximate distance to the
  * query is then the sum of `m` table lookups over its
  * [[PqEncode]] codes ([[PqAdc]]) — the reconstruction-distance
  * identity `d²(q, recon(x)) = Σ_sub d²(q_sub, c_{sub,code})`, exact
  * in integers because every term is.
  *
  * The table is computed ONCE PER QUERY ROW (m·k·(dim/m) = k·dim
  * multiplies) and then each (query, candidate) pair costs m integer
  * lookups instead of a dim-length dot — with dim=64, m=8 that's 8
  * adds vs 64 multiplies, on a codes column 32× narrower than the
  * embeddings it replaces. That scan-byte reduction is the whole
  * point at 100 TB. Same contract as the family: NULL/ragged/
  * NULL-element vector → NULL; codebook embeds as value-equal Seqs.
  */
case class PqDistTable(child: Expression, codebook: Seq[Seq[Long]], m: Int)
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
        s"graft_pq_dist_table requires array<bigint>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_dist_table"

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
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var n2q = 0L
      var d0 = 0
      while (d0 < subDim) { val e = x(base + d0); n2q += e * e; d0 += 1 }
      var c = 0
      while (c < k) {
        val cv = mat(s * k + c)
        var dot = 0L
        var d = 0
        while (d < subDim) { dot += x(base + d) * cv(d); d += 1 }
        out(s * k + c) = n2q + n2s(s * k + c) - 2L * dot
        c += 1
      }
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
      val base = ctx.freshName("base")
      val n2q = ctx.freshName("n2q")
      val e = ctx.freshName("e")
      s"""
         |boolean $bad = $a.numElements() != $dim;
         |long[] $x = $bad ? null : new long[$dim];
         |for (int $i = 0; !$bad && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; } else { $x[$i] = $a.getLong($i); }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[${m * k}];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $base = $s * $subDim;
         |    long $n2q = 0L;
         |    for (int $d = 0; $d < $subDim; $d++) { long $e = $x[$base + $d]; $n2q += $e * $e; }
         |    for (int $c = 0; $c < $k; $c++) {
         |      long[] $cv = $matRef[$s * $k + $c];
         |      long $dot = 0L;
         |      for (int $d = 0; $d < $subDim; $d++) { $dot += $x[$base + $d] * $cv[$d]; }
         |      $out[$s * $k + $c] = $n2q + $n2Ref[$s * $k + $c] - 2L * $dot;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

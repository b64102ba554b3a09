package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of one (canonical, ASCII) string in a
  * single pass: returns `array<struct<chunk_md5: string, chunk_len:
  * long>>` in document order — boundary after char `q+w-1` wherever
  * the Karp–Rabin hash of the window starting at `q` satisfies
  * `(poly mod 2^30) mod avgSize == avgSize-1`.
  *
  * Why a custom Expression: the relational formulation explodes every
  * CHARACTER to a row and drags the corpus through two windows and a
  * sort-aggregate — ~7.5M intermediate rows for a 5k-doc corpus. This
  * is one narrow map: each row chunks itself in a tight byte loop
  * (identical integer math to the relational form and the SQL oracle —
  * [[graft.operators.Dedup.cdcChunks]] documents the shared contract).
  *
  * Input must be the canonicalized text (lowercase, `[a-z0-9 ]` only):
  * the char→code map is the ASCII byte, same as `ascii()` in every
  * engine. NULL input → NULL; empty string → empty array.
  */
case class CdcChunks(child: Expression, w: Int, avgSize: Int)
    extends UnaryExpression {

  require(w >= 2 && w <= 10, s"window $w outside [2,10]")
  require(avgSize >= 2 && (avgSize & (avgSize - 1)) == 0, "avgSize must be a power of two")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_chunks requires string, got $t")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_md5", StringType, nullable = false),
      StructField("chunk_len", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], w, avgSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.CdcChunks.compute($a, $w, $avgSize);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  /** Single-pass chunker — called from both interpreted eval and
    * generated code. ASCII bytes only (guaranteed by canonicalization).
    */
  def compute(canon: UTF8String, w: Int, avgSize: Int): ArrayData = {
    val b = canon.getBytes
    val n = b.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val pow = Array.iterate(1L, w)(_ * 31L).reverse // 31^(w-1) … 31^0
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    // boundary closing after index e = q + w - 1 for marker positions q
    var q = 0
    while (q + w <= n) {
      var poly = 0L
      var j = 0
      while (j < w) { poly += (b(q + j) & 0xffL) * pow(j); j += 1 }
      if ((poly % 1073741824L) % avgSize == avgSize - 1) {
        val e = q + w - 1
        out += chunkRow(md, b, start, e + 1)
        start = e + 1
        // next marker can overlap the boundary char (matches the
        // relational form, whose markers are independent per position)
      }
      q += 1
    }
    if (start < n) out += chunkRow(md, b, start, n)
    new GenericArrayData(out.toArray)
  }

  private def chunkRow(md: java.security.MessageDigest, b: Array[Byte],
      from: Int, until: Int): InternalRow = {
    md.reset()
    md.update(b, from, until - from)
    val hex = md.digest().map(x => f"$x%02x").mkString
    InternalRow(UTF8String.fromString(hex), (until - from).toLong)
  }
}

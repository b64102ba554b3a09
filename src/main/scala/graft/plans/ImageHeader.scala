package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** In-JVM image-header decode — the real slice of the multimodal
  * decode step that needs no codec library: `binary → struct<format:
  * string, width: int, height: int, truncated: boolean>` by parsing
  * the container header bytes directly.
  *
  *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
  *    width/height (bytes 16..23 — IHDR is required first by the PNG
  *    spec); `truncated` iff the stream does not end with the 12-byte
  *    IEND chunk (`00000000 "IEND" AE426082`).
  *  - JPEG: SOI then marker-segment scan (skipping fill bytes and
  *    length-less RST/TEM markers) to the first frame header SOF0–15
  *    (excluding DHT/JPG/DAC), whose payload carries big-endian
  *    height then width; the scan stops at SOS (entropy-coded data
  *    may contain anything); `truncated` iff the last two bytes are
  *    not the EOI marker `FFD9`.
  *  - GIF: `GIF87a`/`GIF89a`, then the little-endian u16 logical
  *    screen width/height; `truncated` iff the last byte is not the
  *    `3B` trailer.
  *
  * Anything else — including a matching signature with an incomplete
  * header — reports `("unknown", null, null, null)` or the format with
  * null dims and `truncated = true`. NULL input → NULL. The same
  * `parse` powers [[graft.operators.Multimodal.withMediaMeta]]'s
  * decode step (one parser, both surfaces), replacing the stub for
  * sniffed image containers; truncation detection is the header-level
  * integrity check a 100 TB ingest wants before any expensive decode.
  *
  * Why a custom Expression (the [[TextStats]] rationale): the
  * byte-poking alternative is a forest of `substring`/`conv`/`case`
  * over binary — interpreted `Invoke`s per branch — or a UDF; this is
  * one per-row call inside whole-stage codegen.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_image_header requires binary, got $t")
    }

  override def dataType: DataType = ImageHeader.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_header"

  override protected def nullSafeEval(input: Any): Any =
    ImageHeader.computeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.ImageHeader.computeRow($a);")

  override protected def withNewChildInternal(newChild: Expression): ImageHeader =
    copy(child = newChild)
}

object ImageHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("truncated", BooleanType, nullable = true)))

  /** Parsed header: `width`/`height` of -1 mean "not recoverable"
    * (null at the row surface); `truncated` is meaningless for
    * `format = "unknown"`.
    */
  final case class Parsed(format: String, width: Int, height: Int,
      truncated: Boolean)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  private val IendTail = Array[Byte](0, 0, 0, 0, 'I', 'E', 'N', 'D',
    0xae.toByte, 0x42, 0x60, 0x82.toByte)

  private def startsWith(b: Array[Byte], sig: Array[Byte]): Boolean = {
    if (b.length < sig.length) return false
    var i = 0
    while (i < sig.length) { if (b(i) != sig(i)) return false; i += 1 }
    true
  }

  private def endsWith(b: Array[Byte], tail: Array[Byte]): Boolean = {
    if (b.length < tail.length) return false
    val off = b.length - tail.length
    var i = 0
    while (i < tail.length) { if (b(off + i) != tail(i)) return false; i += 1 }
    true
  }

  def parse(b: Array[Byte]): Parsed = {
    if (b == null || b.length < 6) return Parsed("unknown", -1, -1, false)
    if (startsWith(b, PngSig)) {
      val trunc = !endsWith(b, IendTail)
      // IHDR must be the first chunk: length(4) type(4) at 8..15
      if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Parsed("png", be32(b, 16), be32(b, 20), trunc)
      else Parsed("png", -1, -1, true)
    } else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      val trunc = !(b.length >= 2 &&
        (b(b.length - 2) & 0xff) == 0xff && (b(b.length - 1) & 0xff) == 0xd9)
      var i = 2
      var w = -1
      var h = -1
      var done = false
      while (!done && i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) { done = true } // lost sync: stop
        else {
          // skip fill bytes (spec: any number of FF before a marker)
          var j = i
          while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
          if (j >= b.length) done = true
          else {
            val m = b(j) & 0xff
            if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i = j + 1
            else if (m == 0xd9 || m == 0xda) done = true // EOI / entropy data
            else if (j + 2 < b.length) {
              val len = be16(b, j + 1)
              val isSof = m >= 0xc0 && m <= 0xcf &&
                m != 0xc4 && m != 0xc8 && m != 0xcc
              if (isSof && j + 7 < b.length) {
                h = be16(b, j + 4) // payload: precision(1) height(2) width(2)
                w = be16(b, j + 6)
                done = true
              } else if (len < 2) done = true // malformed length
              else i = j + 1 + len
            } else done = true
          }
        }
      }
      Parsed("jpeg", w, h, trunc)
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      Parsed("gif", le16(b, 6), le16(b, 8), (b(b.length - 1) & 0xff) != 0x3b)
    } else Parsed("unknown", -1, -1, false)
  }

  def computeRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(p.format),
      if (p.width < 0) null else p.width,
      if (p.height < 0) null else p.height,
      if (p.format == "unknown") null else p.truncated))
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** In-JVM audio/video container-header decode — [[ImageHeader]]'s
  * sibling for the time-based media the multimodal stub used to fake:
  * `binary → struct<format: string, channels: int, sample_rate: int,
  * duration_ms: long, truncated: boolean>`, parsing header bytes only
  * (no codec, no frame decode).
  *
  *  - WAV (RIFF/WAVE): the `fmt ` chunk's little-endian channel count,
  *    sample rate, and byte rate; `duration_ms = data-chunk bytes ×
  *    1000 / byte_rate` (integer division — the exact header algebra,
  *    reproducible in SQL); `truncated` iff the actual stream is
  *    shorter than the RIFF size field promises (8 + riff_size).
  *  - MP4 (ISO BMFF): walk top-level boxes to `moov`, then its `mvhd`
  *    child — version 0 (u32 timescale/duration) and version 1 (u64
  *    duration) both handled; `duration_ms = duration × 1000 /
  *    timescale`; channels/sample_rate stay null (they live per-track,
  *    beyond a header-level parse); `truncated` iff any top-level box
  *    promises more bytes than remain (the classic cut-off `mdat`).
  *
  * Anything else → `("unknown", null, null, null, null)`; a matching
  * signature whose required chunk/box is missing or cut reports the
  * format with null fields and `truncated = true`. NULL input → NULL.
  * Shares the decode step of
  * [[graft.operators.Multimodal.withMediaMeta]] with [[ImageHeader]]
  * (images → dims; RIFF/MP4 → duration), so the deterministic stub
  * now covers only genuinely codec-level work (pixels, samples,
  * per-track layouts).
  */
case class AvHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_av_header requires binary, got $t")
    }

  override def dataType: DataType = AvHeader.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_av_header"

  override protected def nullSafeEval(input: Any): Any =
    AvHeader.computeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.AvHeader.computeRow($a);")

  override protected def withNewChildInternal(newChild: Expression): AvHeader =
    copy(child = newChild)
}

object AvHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("truncated", BooleanType, nullable = true)))

  /** Parsed header: negative numeric fields mean "not recoverable"
    * (null at the row surface).
    */
  final case class Parsed(format: String, channels: Int, sampleRate: Int,
      durationMs: Long, truncated: Boolean)

  private val Unknown = Parsed("unknown", -1, -1, -1L, false)

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  private def parseWav(b: Array[Byte]): Parsed = {
    val riffSize = le32(b, 4)
    val trunc = b.length < 8 + riffSize
    var channels = -1
    var rate = -1
    var byteRate = -1L
    var dataSize = -1L
    var i = 12 // first chunk after "RIFF"<size>"WAVE"
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ") && i + 8 + 12 <= b.length) {
        channels = le16(b, i + 10)       // payload +2
        rate = le32(b, i + 12).toInt     // payload +4
        byteRate = le32(b, i + 16)       // payload +8
      } else if (tag(b, i, "data")) dataSize = size
      // chunks are word-aligned: odd sizes carry a pad byte. Clamp the
      // claimed size to the stream length before narrowing: a garbage
      // 32-bit size near 4G is a positive Long but a NEGATIVE Int, and
      // un-clamped it would walk the cursor backwards forever.
      val step = math.min(size, b.length.toLong).toInt
      i += 8 + step + (step & 1)
    }
    val durMs =
      if (dataSize >= 0 && byteRate > 0) dataSize * 1000L / byteRate else -1L
    if (channels < 0) Parsed("wav", -1, -1, -1L, truncated = true)
    else Parsed("wav", channels, rate, durMs, trunc)
  }

  /** Scan the children of `[from, to)` for `mvhd`; boxes promising
    * more than `to` mark truncation via the sentinel result.
    */
  private def parseMp4(b: Array[Byte]): Parsed = {
    var durMs = -1L
    var trunc = false
    var i = 0
    while (i + 8 <= b.length) {
      val size = be32(b, i)
      if (size < 8) { trunc = true; i = b.length } // malformed: stop
      else {
        if (i + size > b.length) trunc = true // promised more than present
        if (tag(b, i + 4, "moov")) {
          // scan moov's children for mvhd
          var j = i + 8
          val end = math.min(i + size, b.length.toLong).toInt
          while (j + 8 <= end && durMs < 0) {
            val cs = be32(b, j)
            if (cs < 8) { j = end }
            else {
              if (tag(b, j + 4, "mvhd") && j + 8 + 4 <= end) {
                val ver = b(j + 8) & 0xff
                if (ver == 1 && j + 8 + 4 + 16 + 12 <= end) {
                  val ts = be32(b, j + 8 + 4 + 16)
                  val dur = be64(b, j + 8 + 4 + 20)
                  if (ts > 0) durMs = dur * 1000L / ts
                } else if (ver == 0 && j + 8 + 4 + 8 + 8 <= end) {
                  val ts = be32(b, j + 8 + 4 + 8)
                  val dur = be32(b, j + 8 + 4 + 12)
                  if (ts > 0) durMs = dur * 1000L / ts
                }
              }
              j += math.max(math.min(cs, end.toLong).toInt, 8)
            }
          }
        }
        // same narrowing hazard as the WAV walk: clamp before toInt so
        // a 4G-ish box size ends the walk instead of reversing it
        i += math.min(size, b.length.toLong).toInt
      }
    }
    if (durMs < 0) Parsed("mp4", -1, -1, -1L, truncated = true)
    else Parsed("mp4", -1, -1, durMs, trunc)
  }

  def parse(b: Array[Byte]): Parsed = {
    if (b == null || b.length < 12) return Unknown
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) parseWav(b)
    else if (tag(b, 4, "ftyp")) parseMp4(b)
    else Unknown
  }

  def computeRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(p.format),
      if (p.channels < 0) null else p.channels,
      if (p.sampleRate < 0) null else p.sampleRate,
      if (p.durationMs < 0) null else p.durationMs,
      if (p.format == "unknown") null else p.truncated))
  }
}

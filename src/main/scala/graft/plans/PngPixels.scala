package graft.plans

import java.util.zip.Inflater

/** Decoded PNG raster: `pixels` is row-major, `channels` interleaved
  * bytes per pixel (1 = gray, 2 = gray+alpha, 3 = RGB, 4 = RGBA).
  */
final case class PngImage(width: Int, height: Int, channels: Int,
    pixels: Array[Byte])

/** Pure-JVM PNG PIXEL decode — the real codec step behind
  * [[graft.operators.Multimodal]]'s `decoded_real` flag (closing the
  * repo's last documented decode stub for the one container a JVM can
  * decode with nothing but `java.util.zip`): chunk walk → IDAT concat →
  * zlib `Inflater` → per-scanline unfilter (all five PNG filter types,
  * including Paeth). Bit-exact against `javax.imageio`'s reader
  * (PngPixelsSpec round-trips synthetic images differentially).
  *
  * Scope is the common web-corpus shape: 8-bit depth, color types
  * 0/2/4/6 (gray, RGB, gray+alpha, RGBA), non-interlaced, as written
  * by virtually every encoder's default path. Anything else — 1/2/4/16
  * bit depths, palette (type 3), Adam7 interlace, malformed chunks,
  * short IDAT — returns None rather than wrong pixels, and the caller
  * keeps `decoded_real = false`: honesty in the schema, not just the
  * scaladoc. Reference container spec: PNG (ISO/IEC 15948).
  */
object PngPixels {

  private val Signature = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47,
    0x0D, 0x0A, 0x1A, 0x0A)

  def decode(bytes: Array[Byte]): Option[PngImage] = {
    if (bytes == null || bytes.length < 45) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return None; i += 1 }
    var pos = 8
    var width, height = 0
    var channels = 0
    var haveIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    def be32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    var done = false
    while (!done) {
      if (pos + 8 > bytes.length) return None
      val len = be32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataAt = pos + 8
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(dataAt).toInt
          height = be32(dataAt + 4).toInt
          val bitDepth = bytes(dataAt + 8) & 0xff
          val colorType = bytes(dataAt + 9) & 0xff
          val compression = bytes(dataAt + 10) & 0xff
          val filterMethod = bytes(dataAt + 11) & 0xff
          val interlace = bytes(dataAt + 12) & 0xff
          channels = colorType match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case _ => return None // palette / unknown
          }
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
            interlace != 0 || width <= 0 || height <= 0) return None
          // raster size guard: refuse anything whose pixel buffer
          // would not fit a sane task (a decode amplifier bomb)
          if (width.toLong * height * channels > (1L << 28)) return None
          haveIhdr = true
        case "IDAT" =>
          if (!haveIhdr) return None
          idat.write(bytes, dataAt, len.toInt)
        case "IEND" => done = true
        case _ => () // ancillary chunks skip
      }
      pos = dataAt + len.toInt + 4 // data + CRC (not validated)
    }
    if (!haveIhdr || idat.size() == 0) return None

    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated IDAT
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (off != raw.length) return None

    val out = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      filter match {
        case 0 => // None
          System.arraycopy(raw, rowIn, out, rowOut, stride)
        case 1 => // Sub
          while (x < stride) {
            val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + left).toByte
            x += 1
          }
        case 2 => // Up
          while (x < stride) {
            val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + up).toByte
            x += 1
          }
        case 3 => // Average
          while (x < stride) {
            val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
            val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + (left + up) / 2).toByte
            x += 1
          }
        case 4 => // Paeth
          while (x < stride) {
            val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
            val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
            val ul = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xff else 0
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + pred).toByte
            x += 1
          }
        case _ => return None
      }
      y += 1
    }
    Some(PngImage(width, height, channels, out))
  }
}

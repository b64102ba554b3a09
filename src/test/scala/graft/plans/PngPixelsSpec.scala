package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Differential tests of the pure-JVM PNG pixel decoder against
  * `javax.imageio`'s ENCODER: synthetic rasters round-trip through
  * ImageIO's PNG writer (whose filter selection exercises the real
  * filter mix, Paeth included) and must decode back bit-exact.
  */
class PngPixelsSpec extends AnyFunSuite {

  private def encode(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos), "ImageIO refused to write png")
    bos.toByteArray
  }

  // a deterministic non-trivial raster: gradients + stripes force
  // several scanline filters in the encoder's heuristic
  private def pattern(w: Int, h: Int, rgba: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h,
      if (rgba) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 37 + y * 11) % 256
      val g = (x * x + y) % 256
      val b = if (y % 2 == 0) 255 - x % 256 else x % 256
      val a = if (rgba) (128 + (x + y) * 13 % 128) else 255
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    img
  }

  test("RGB round-trip: decoded pixels == the raster ImageIO encoded") {
    val img = pattern(23, 17, rgba = false)
    val out = PngPixels.decode(encode(img)).get
    assert((out.width, out.height, out.channels) == ((23, 17, 3)))
    for (y <- 0 until 17; x <- 0 until 23) {
      val argb = img.getRGB(x, y)
      val o = (y * 23 + x) * 3
      assert((out.pixels(o) & 0xff) == ((argb >> 16) & 0xff), s"R at $x,$y")
      assert((out.pixels(o + 1) & 0xff) == ((argb >> 8) & 0xff), s"G at $x,$y")
      assert((out.pixels(o + 2) & 0xff) == (argb & 0xff), s"B at $x,$y")
    }
  }

  test("RGBA round-trip with alpha") {
    val img = pattern(9, 31, rgba = true)
    val out = PngPixels.decode(encode(img)).get
    assert((out.width, out.height, out.channels) == ((9, 31, 4)))
    for (y <- 0 until 31; x <- 0 until 9) {
      val argb = img.getRGB(x, y)
      val o = (y * 9 + x) * 4
      assert((out.pixels(o) & 0xff) == ((argb >> 16) & 0xff))
      assert((out.pixels(o + 1) & 0xff) == ((argb >> 8) & 0xff))
      assert((out.pixels(o + 2) & 0xff) == (argb & 0xff))
      assert((out.pixels(o + 3) & 0xff) == ((argb >>> 24) & 0xff), s"A at $x,$y")
    }
  }

  test("grayscale round-trip") {
    val img = new BufferedImage(16, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 16) {
      val v = (x * 16 + y * 3) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val out = PngPixels.decode(encode(img)).get
    assert((out.width, out.height, out.channels) == ((16, 4, 1)))
    for (y <- 0 until 4; x <- 0 until 16)
      assert((out.pixels(y * 16 + x) & 0xff) == img.getRaster.getSample(x, y, 0))
  }

  test("the checked-in 1x1 fixture decodes to its actual RGBA value") {
    val realPng = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val out = PngPixels.decode(realPng).get
    assert((out.width, out.height, out.channels) == ((1, 1, 4)))
    // scanline is Sub-filtered [0,0,255,127] with no left neighbor:
    // a half-transparent pure blue pixel
    assert(out.pixels.map(_ & 0xff).toSeq == Seq(0, 0, 255, 127))
  }

  test("malformed inputs refuse instead of fabricating pixels") {
    val good = encode(pattern(8, 8, rgba = false))
    assert(PngPixels.decode(null).isEmpty)
    assert(PngPixels.decode(Array.fill[Byte](50)(7)).isEmpty, "bad signature")
    assert(PngPixels.decode(good.take(60)).isEmpty, "truncated IDAT")
    // flip one byte INSIDE the deflate stream: either the stream
    // breaks (None) or it still inflates to a full raster — what must
    // never happen is a short/partial raster passed off as decoded
    val flipped = good.clone(); flipped(good.length - 20) =
      (flipped(good.length - 20) ^ 0x5a).toByte
    PngPixels.decode(flipped).foreach { img =>
      assert(img.pixels.length == 8 * 8 * 3)
    }
  }
}

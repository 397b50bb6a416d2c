package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jpeg

/** Baseline JPEG codec validation. The independent reference decoder
  * is the JDK's ImageIO (its own libjpeg-derived implementation):
  * both decoders run over the same bytes and must agree within the
  * T.81 IDCT tolerance (±2 per sample after color convert); for
  * JDK-ENCODED 4:2:0 streams the comparison allows for the chroma
  * upsampling difference (ImageIO interpolates, this decoder
  * replicates — identical on chroma-flat images, bounded on smooth
  * gradients). */
class JpegSpec extends AnyFunSuite {

  private def smoothRgb(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = (x * 255) / math.max(w - 1, 1)
      val g = (y * 255) / math.max(h - 1, 1)
      val b = ((x + y) * 255) / math.max(w + h - 2, 1)
      (r << 16) | (g << 8) | b
    }

  private def maxDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (p, q) =>
      math.max(math.abs(((p >> 16) & 0xFF) - ((q >> 16) & 0xFF)),
        math.max(math.abs(((p >> 8) & 0xFF) - ((q >> 8) & 0xFF)),
          math.abs((p & 0xFF) - (q & 0xFF))))
    }.max

  private def meanDiff(a: Array[Int], b: Array[Int]): Double =
    a.zip(b).map { case (p, q) =>
      (math.abs(((p >> 16) & 0xFF) - ((q >> 16) & 0xFF)) +
        math.abs(((p >> 8) & 0xFF) - ((q >> 8) & 0xFF)) +
        math.abs((p & 0xFF) - (q & 0xFF))) / 3.0
    }.sum / a.length

  private def imageIoPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val bi = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val px = Array.tabulate(bi.getWidth * bi.getHeight)(i =>
      bi.getRGB(i % bi.getWidth, i / bi.getWidth) & 0xFFFFFF)
    (bi.getWidth, bi.getHeight, px)
  }

  test("encode → decode round trip stays close on a smooth gradient (q=90)") {
    val (w, h) = (37, 23) // non-multiple-of-8 dims exercise edge padding
    val src = smoothRgb(w, h)
    val jpg = Jpeg.encode(Jpeg.Image(w, h, src), quality = 90)
    val dec = Jpeg.decode(jpg)
    assert(dec.width === w && dec.height === h)
    assert(maxDiff(src, dec.rgb) <= 20, "lossy error beyond q=90 expectation")
    assert(meanDiff(src, dec.rgb) <= 3.0)
  }

  test("our encoder's output decodes identically in ImageIO (4:4:4, no upsampling)") {
    val (w, h) = (32, 16)
    val jpg = Jpeg.encode(Jpeg.Image(w, h, smoothRgb(w, h)), quality = 85)
    val mine = Jpeg.decode(jpg)
    val (iw, ih, ref) = imageIoPixels(jpg)
    assert((iw, ih) === ((w, h)))
    // identical streams, two independent IDCT+color implementations
    assert(maxDiff(mine.rgb, ref) <= 2)
  }

  test("JDK-encoded color JPEG (4:2:0) decodes: dims exact, pixels within upsampling tolerance") {
    val (w, h) = (41, 29)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val src = smoothRgb(w, h)
    for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, src(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(bi, "jpg", bos), "JDK JPEG writer unavailable")
    val jpg = bos.toByteArray
    val mine = Jpeg.decode(jpg)
    val (iw, ih, ref) = imageIoPixels(jpg)
    assert(mine.width === iw && mine.height === ih)
    assert(meanDiff(mine.rgb, ref) <= 2.0) // replicate vs interpolate chroma
    assert(maxDiff(mine.rgb, ref) <= 48)   // bounded at chroma edges
  }

  test("JDK-encoded grayscale JPEG decodes within IDCT tolerance (1-component path)") {
    val (w, h) = (24, 17)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = ((x * 7 + y * 13) % 256)
      bi.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(bi, "jpg", bos))
    val jpg = bos.toByteArray
    val mine = Jpeg.decode(jpg)
    // compare RAW raster samples: getRGB on TYPE_BYTE_GRAY would run
    // the JDK's gray→sRGB colorspace conversion and shift every level
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(mine.width === ref.getWidth && mine.height === ref.getHeight)
    val diffs = for (y <- 0 until h; x <- 0 until w) yield
      math.abs((mine.rgb(y * w + x) & 0xFF) - ref.getRaster.getSample(x, y, 0))
    assert(diffs.max <= 2)
  }

  test("restart markers: our 4:4:4 stream with DRI decodes equal to the no-DRI stream") {
    val (w, h) = (40, 24)
    val src = smoothRgb(w, h)
    val plain = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, src), quality = 80))
    val rst = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, src), quality = 80,
      restartInterval = 3))
    assert(plain.rgb.toSeq === rst.rgb.toSeq)
    // and ImageIO agrees the DRI stream is valid
    val (iw, ih, _) = imageIoPixels(
      Jpeg.encode(Jpeg.Image(w, h, src), quality = 80, restartInterval = 3))
    assert((iw, ih) === ((w, h)))
  }

  test("progressive and truncated streams fail loudly, not silently") {
    val jpg = Jpeg.encode(Jpeg.Image(8, 8, Array.fill(64)(0x808080)))
    // flip SOF0 (FFC0) to SOF2 (FFC2)
    val prog = jpg.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    val e1 = intercept[RuntimeException](Jpeg.decode(prog))
    assert(e1.getMessage.contains("progressive"))
    val e2 = intercept[Exception](Jpeg.decode(jpg.take(20)))
    assert(e2.getMessage != null)
  }
}

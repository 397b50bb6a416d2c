package graft.sources

/** Minimal uncompressed 24-bit BMP codec — BITMAPFILEHEADER +
  * BITMAPINFOHEADER, BI_RGB, bottom-up row order, 4-byte row padding.
  * Pure JVM (no image libraries exist in this environment), so the
  * Multimodal decode kernel is REAL for images: header parse + pixel
  * extraction, not a byte-histogram stand-in. The reference treats
  * media as opaque blobs; this is the north-star multimodal surface
  * (SURVEY §2 extensions).
  */
object Bmp {

  /** Decoded image: row-major, top-down, packed 0xRRGGBB. */
  final case class Image(width: Int, height: Int, rgb: Array[Int])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  private def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  def encode(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height, "pixel count mismatch")
    val rs = rowSize(img.width)
    val dataSize = rs * img.height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length)
    putLe32(out, 10, 54) // pixel-data offset
    putLe32(out, 14, 40) // BITMAPINFOHEADER size
    putLe32(out, 18, img.width)
    putLe32(out, 22, img.height) // positive = bottom-up
    putLe16(out, 26, 1) // planes
    putLe16(out, 28, 24) // bpp
    putLe32(out, 30, 0) // BI_RGB
    putLe32(out, 34, dataSize)
    var y = 0
    while (y < img.height) {
      val srcRow = img.height - 1 - y // bottom-up storage
      var x = 0
      while (x < img.width) {
        val px = img.rgb(srcRow * img.width + x)
        val o = 54 + y * rs + 3 * x
        out(o) = (px & 0xFF).toByte // B
        out(o + 1) = ((px >> 8) & 0xFF).toByte // G
        out(o + 2) = ((px >> 16) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val offset = le32(bytes, 10)
    require(le32(bytes, 14) >= 40, "unsupported BMP header")
    val width = le32(bytes, 18)
    val heightRaw = le32(bytes, 22)
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw)
    require(le16(bytes, 28) == 24, "only 24-bit BMP supported")
    require(le32(bytes, 30) == 0, "only uncompressed BI_RGB supported")
    val rs = rowSize(width)
    require(bytes.length >= offset + rs * height, "truncated pixel data")
    val rgb = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var x = 0
      while (x < width) {
        val o = offset + srcRow * rs + 3 * x
        rgb(y * width + x) = (bytes(o) & 0xFF) |
          ((bytes(o + 1) & 0xFF) << 8) | ((bytes(o + 2) & 0xFF) << 16)
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }
}

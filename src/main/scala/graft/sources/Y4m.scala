package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal YUV4MPEG2 (Y4M) codec — the standard uncompressed video
  * container (mjpegtools/ffmpeg `-f yuv4mpeg`): an ASCII stream
  * header `YUV4MPEG2 W<w> H<h> F<n>:<d> ... [C<space>]`, then one
  * `FRAME[ params]\n` marker per frame followed by raw planar YUV.
  * Supported colorspaces: C444 (three full-resolution planes), C420
  * (chroma at half resolution both axes, the `C420jpeg`/`C420mpeg2`
  * variants parse identically at this layer), and Cmono (luma only).
  * Pure JVM (no media libraries exist in this environment), so the
  * Multimodal decode kernel is REAL for video: header parse + frame
  * walk + plane extraction, not a byte-histogram stand-in. The
  * reference treats media as opaque blobs; this is the north-star
  * multimodal surface (SURVEY §2 extensions).
  */
object Y4m {

  /** One decoded frame: planar luma + chroma (u/v empty for mono). */
  final case class Frame(y: Array[Byte], u: Array[Byte], v: Array[Byte])

  /** Decoded video. `colorspace` is the Y4M C-tag ("444", "420",
    * "mono"); chroma plane dims derive from it. */
  final case class Video(width: Int, height: Int, fpsNum: Int,
      fpsDen: Int, colorspace: String, frames: Vector[Frame])

  private def chromaSize(width: Int, height: Int, cs: String): Int = cs match {
    case "444" => width * height
    case "420" => ((width + 1) / 2) * ((height + 1) / 2)
    case "mono" => 0
    case other => throw new IllegalArgumentException(
      s"unsupported Y4M colorspace C$other")
  }

  def encode(v: Video): Array[Byte] = {
    val header = s"YUV4MPEG2 W${v.width} H${v.height} " +
      s"F${v.fpsNum}:${v.fpsDen} Ip A1:1 C${v.colorspace}\n"
    val ySize = v.width * v.height
    val cSize = chromaSize(v.width, v.height, v.colorspace)
    val out = new ArrayBuffer[Byte](
      header.length + v.frames.length * (6 + ySize + 2 * cSize))
    out ++= header.getBytes("US-ASCII")
    v.frames.foreach { f =>
      require(f.y.length == ySize, s"luma plane must be $ySize bytes")
      require(f.u.length == cSize && f.v.length == cSize,
        s"chroma planes must be $cSize bytes for C${v.colorspace}")
      out ++= "FRAME\n".getBytes("US-ASCII")
      out ++= f.y; out ++= f.u; out ++= f.v
    }
    out.toArray
  }

  def decode(bytes: Array[Byte]): Video = {
    var nl = 0
    while (nl < bytes.length && bytes(nl) != '\n') nl += 1
    require(nl < bytes.length, "missing Y4M header terminator")
    val header = new String(bytes, 0, nl, "US-ASCII")
    val parts = header.split(' ')
    require(parts.headOption.contains("YUV4MPEG2"), "not a Y4M payload")
    var w = -1; var h = -1; var fn = 30; var fd = 1; var cs = "420"
    parts.tail.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.drop(1).toInt
        case 'H' => h = p.drop(1).toInt
        case 'F' =>
          val Array(n, d) = p.drop(1).split(':')
          fn = n.toInt; fd = d.toInt
        case 'C' =>
          // C420jpeg / C420mpeg2 / C420paldv share the 4:2:0 layout
          cs = if (p.startsWith("C420")) "420" else p.drop(1)
        case _ => // I (interlace), A (aspect), X (comment): irrelevant here
      }
    }
    require(w > 0 && h > 0, "Y4M header missing W/H")
    val ySize = w * h
    val cSize = chromaSize(w, h, cs)
    val frames = Vector.newBuilder[Frame]
    var off = nl + 1
    while (off < bytes.length) {
      require(off + 5 <= bytes.length &&
        new String(bytes, off, 5, "US-ASCII") == "FRAME",
        s"expected FRAME marker at offset $off")
      off += 5
      while (off < bytes.length && bytes(off) != '\n') off += 1 // frame params
      require(off < bytes.length, "missing FRAME terminator")
      off += 1
      require(off + ySize + 2 * cSize <= bytes.length, "truncated frame data")
      val y = java.util.Arrays.copyOfRange(bytes, off, off + ySize)
      val u = java.util.Arrays.copyOfRange(bytes, off + ySize, off + ySize + cSize)
      val v = java.util.Arrays.copyOfRange(
        bytes, off + ySize + cSize, off + ySize + 2 * cSize)
      frames += Frame(y, u, v)
      off += ySize + 2 * cSize
    }
    Video(w, h, fn, fd, cs, frames.result())
  }

  /** Frame count without materializing planes — header parse + stride
    * walk only (cheap probe for metadata columns). Enforces the same
    * structural requires as `decode` — a malformed payload fails
    * loudly here too, never returns a garbage count. */
  def frameCount(bytes: Array[Byte]): Int = {
    var nl = 0
    while (nl < bytes.length && bytes(nl) != '\n') nl += 1
    require(nl < bytes.length, "missing Y4M header terminator")
    val v0 = new String(bytes, 0, nl, "US-ASCII")
    val parts = v0.split(' ')
    require(parts.headOption.contains("YUV4MPEG2"), "not a Y4M payload")
    var w = -1; var h = -1; var cs = "420"
    parts.tail.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.drop(1).toInt
        case 'H' => h = p.drop(1).toInt
        case 'C' => cs = if (p.startsWith("C420")) "420" else p.drop(1)
        case _ =>
      }
    }
    require(w > 0 && h > 0, "Y4M header missing W/H")
    val stride = w * h + 2 * chromaSize(w, h, cs)
    var off = nl + 1
    var n = 0
    while (off < bytes.length) {
      require(off + 5 <= bytes.length &&
        new String(bytes, off, 5, "US-ASCII") == "FRAME",
        s"expected FRAME marker at offset $off")
      off += 5
      while (off < bytes.length && bytes(off) != '\n') off += 1
      require(off < bytes.length, "missing FRAME terminator")
      off += 1
      require(off + stride <= bytes.length, "truncated frame data")
      off += stride
      n += 1
    }
    n
  }
}

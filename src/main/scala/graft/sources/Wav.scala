package graft.sources

/** Minimal RIFF/WAVE codec — PCM (format 1), 16-bit little-endian
  * samples, mono or interleaved multi-channel, standard `fmt ` +
  * `data` chunk walk (unknown chunks skipped, word-aligned). Pure JVM
  * (no audio libraries exist in this environment), so the Multimodal
  * decode kernel is REAL for audio: header parse + sample extraction,
  * not a byte-histogram stand-in. The reference treats media as
  * opaque blobs; this is the north-star multimodal surface (SURVEY §2
  * extensions).
  */
object Wav {

  /** Decoded audio: interleaved 16-bit samples. */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

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

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  def encode(a: Audio): Array[Byte] = {
    val dataSize = 2 * a.samples.length
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16) // PCM fmt chunk size
    putLe16(out, 20, 1) // PCM
    putLe16(out, 22, a.channels)
    putLe32(out, 24, a.sampleRate)
    putLe32(out, 28, a.sampleRate * a.channels * 2) // byte rate
    putLe16(out, 32, a.channels * 2) // block align
    putLe16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataSize)
    var i = 0
    while (i < a.samples.length) {
      putLe16(out, 44 + 2 * i, a.samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a WAV payload")
    var off = 12
    var rate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      id match {
        case "fmt " =>
          require(le16(bytes, off + 8) == 1, "only PCM supported")
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          require(le16(bytes, off + 22) == 16, "only 16-bit supported")
        case "data" =>
          require(off + 8 + size <= bytes.length, "truncated data chunk")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = le16(bytes, off + 8 + 2 * i).toShort
            i += 1
          }
        case _ => // skip unknown chunks (LIST, fact, …)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(rate > 0 && channels > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    Audio(rate, channels, samples)
  }
}

package graft.multimodal

/** WAV/RIFF PCM decode from first principles (the audio leg of the
  * multimodal mandate, alongside [[PixelDecode]] for images): RIFF
  * container walk, `fmt ` chunk validation, 16-bit little-endian PCM
  * samples. No codec library — pure byte arithmetic, same posture as the
  * image decoders.
  *
  * Quarantine contract (identical to [[PixelDecode]]): anything that is
  * not 16-bit integer PCM — compressed codecs, 8/24/32-bit, float PCM,
  * truncated or malformed containers — returns None; decode never throws
  * past its own boundary and never hangs. Allocation is bounded by the
  * BYTES ACTUALLY PRESENT, never by a header-declared length, so a
  * crafted 50-byte file claiming a 4 GB data chunk cannot OOM the
  * executor (the decode-bomb rule from the image path).
  */
object WavDecode {

  /** Decoded clip: interleaved 16-bit samples as Ints ([-32768, 32767]),
    * channel-major within each frame (L R L R ... for stereo).
    */
  final case class Clip(sampleRate: Int, channels: Int, samples: Array[Int]) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
    /** Sample at frame `i`, channel `ch`. */
    def at(i: Int, ch: Int): Int = samples(i * channels + ch)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)).toLong & 0xffffffffL

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE")

  def decode(b: Array[Byte]): Option[Clip] = {
    if (!isWav(b)) return None
    try {
      var i = 12
      var channels = -1
      var sampleRate = -1
      var bits = -1
      var fmtCode = -1
      var out: Option[Clip] = None
      // chunk walk; `data` before `fmt ` is malformed → quarantine (we
      // need the format to interpret the samples)
      while (i + 8 <= b.length && out.isEmpty) {
        val sz = le32(b, i + 4)
        val body = i + 8
        if (tag(b, i, "fmt ")) {
          if (sz < 16 || body + 16 > b.length) return None
          fmtCode = le16(b, body)
          channels = le16(b, body + 2)
          sampleRate = le32(b, body + 4).toInt
          bits = le16(b, body + 14)
        } else if (tag(b, i, "data")) {
          if (fmtCode != 1 || bits != 16) return None // int PCM 16-bit only
          if (channels < 1 || channels > 8 || sampleRate <= 0) return None
          // bound by bytes PRESENT, not the declared size: a header
          // claiming 4 GB over a 50-byte file must not drive allocation
          val avail = math.min(sz, (b.length - body).toLong)
          val nSamples = (avail / 2).toInt
          val n = nSamples - nSamples % channels // whole frames only
          val samples = new Array[Int](n)
          var k = 0
          while (k < n) {
            samples(k) = le16(b, body + k * 2).toShort.toInt // sign-extend
            k += 1
          }
          out = Some(Clip(sampleRate, channels, samples))
        }
        // chunks are word-aligned: odd sizes carry one pad byte; a size
        // whose advance overflows or fails to progress is garbage
        val next = body.toLong + sz + (sz & 1L)
        if (next <= i || next > Int.MaxValue) return None
        i = next.toInt
      }
      out
    } catch { case _: Exception => None }
  }
}

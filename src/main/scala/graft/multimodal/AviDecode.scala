package graft.multimodal

/** AVI/RIFF video decode from first principles — the video leg of the
  * multimodal mandate, completing the triad with [[PixelDecode]] (images)
  * and [[WavDecode]] (audio). Parses the nested RIFF structure (`RIFF
  * 'AVI '` → `LIST hdrl` → `strl`/`strf` → `LIST movi`) and decodes
  * uncompressed 24-bit DIB frames (`00db` chunks: bottom-up rows, BGR
  * byte order, 4-byte stride — the same pixel walk as BMP, normalized to
  * top-down RGB).
  *
  * Quarantine contract (identical to the other decoders): compressed
  * streams (`00dc`), non-24-bit frames, malformed or truncated containers
  * → None / frame skipped; decode never throws past its boundary and
  * never hangs. Geometry is capped at [[PixelDecode.MaxPixels]] BEFORE
  * any frame allocation, and each frame's pixel walk is bounded by the
  * bytes actually present — header-declared sizes never drive allocation
  * (the decode-bomb rule).
  */
object AviDecode {

  /** Decoded clip: per-frame RGB grids (top row first, like
    * [[PixelDecode.Image]]). Frames whose chunk bytes were truncated are
    * dropped rather than half-decoded.
    */
  final case class Video(width: Int, height: Int, frames: IndexedSeq[Array[Int]]) {
    def nFrames: Int = frames.length
    /** Sample at frame `f`, image row `r`, column `c`, channel `ch` (RGB). */
    def at(f: Int, r: Int, c: Int, ch: Int): Int =
      frames(f)((r * width + c) * 3 + ch)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)).toLong & 0xffffffffL

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length && (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)

  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "AVI ")

  def decode(b: Array[Byte]): Option[Video] = {
    if (!isAvi(b)) return None
    try {
      var w = -1; var h = -1; var bits = -1; var comp = -1L
      val frameChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // nested chunk walk; LIST bodies recurse (their first 4 bytes are
      // the list type), leaf chunks are inspected by fourcc
      def walk(start: Int, end: Int): Boolean = {
        var i = start
        while (i + 8 <= end) {
          val sz = le32(b, i + 4)
          val body = i + 8
          val lim = math.min(body.toLong + sz, end.toLong).toInt
          if (tag(b, i, "LIST")) {
            if (!walk(body + 4, lim)) return false
          } else if (tag(b, i, "strf")) {
            if (sz < 40 || body + 40 > b.length) return false
            w = le32(b, body + 4).toInt
            h = le32(b, body + 8).toInt
            bits = le16(b, body + 14)
            comp = le32(b, body + 16)
          } else if (tag(b, i, "00db")) {
            frameChunks += ((body, lim - body))
          }
          val next = body.toLong + sz + (sz & 1L)
          if (next <= i || next > Int.MaxValue) return false // no progress
          i = next.toInt
        }
        true
      }
      if (!walk(12, b.length)) return None
      // uncompressed 24-bit DIB only; geometry capped before allocating
      if (w <= 0 || h <= 0 || bits != 24 || comp != 0L) return None
      if (w.toLong * h > PixelDecode.MaxPixels) return None
      val stride = ((w * 3 + 3) / 4) * 4
      val frameBytes = stride * h
      val frames = frameChunks.collect {
        // truncated frame chunks are dropped, not half-decoded
        case (off, avail) if avail >= frameBytes =>
          val out = new Array[Int](w * h * 3)
          var r = 0
          while (r < h) {
            val base = off + (h - 1 - r) * stride // bottom-up file rows
            var c = 0
            while (c < w) {
              val p = base + c * 3 // stored B,G,R → emit R,G,B
              val o = (r * w + c) * 3
              out(o) = u8(b, p + 2)
              out(o + 1) = u8(b, p + 1)
              out(o + 2) = u8(b, p)
              c += 1
            }
            r += 1
          }
          out
      }.toIndexedSeq
      if (frames.isEmpty) None else Some(Video(w, h, frames))
    } catch { case _: Exception => None }
  }
}

package graft.multimodal

/** Lossless JPEG encoder (ITU-T T.81 annex H, SOF3): per-sample
  * prediction + Huffman-coded differences — no DCT, no quantization,
  * bit-exact by construction. Fixture writer for the lossless decode
  * gate (ImageIO cannot write SOF3 either). Components are stored
  * untransformed (no YCbCr — lossless carries no JFIF color contract),
  * 1×1 sampling, one interleaved scan, any predictor 1-7, optional
  * point transform. The difference alphabet uses one canonical Huffman
  * table with all 17 SSSS categories at 5 bits (Kraft-complete, trivially
  * canonical) — compression is not the point, exactness is.
  */
object JpegLosslessEncode {

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nbits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nbits += 1
      if (nbits == 8) {
        out.write(cur)
        if (cur == 0xff) out.write(0x00) // byte stuffing (B.1.1.5)
        cur = 0; nbits = 0
      }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    def flush(): Unit = while (nbits != 0) bit(1) // 1-padding to a boundary
  }

  private def put16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }

  /** Encode `px(y, x, ch)` (`channels` ∈ {1, 3}, samples in
    * [0, 2^precision)) losslessly with the given predictor (1-7) and
    * point transform `pt` (samples are right-shifted by `pt` before
    * coding; pt = 0 is fully lossless).
    */
  def encode(width: Int, height: Int, channels: Int,
      px: (Int, Int, Int) => Int, predictor: Int = 1, pt: Int = 0,
      precision: Int = 8): Array[Byte] = {
    require(channels == 1 || channels == 3, "1 or 3 channels")
    require(predictor >= 1 && predictor <= 7, "annex-H predictor 1-7")
    require(precision >= 2 && precision <= 12, "2- to 12-bit samples")
    require(pt >= 0 && pt < precision, "point transform below precision")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // one DC-class table: all 17 difference categories at 5 bits
    out.write(0xff); out.write(0xc4); put16(out, 2 + 17 + 17)
    out.write(0x00) // class 0 (DC-style), destination 0
    for (l <- 1 to 16) out.write(if (l == 5) 17 else 0)
    for (s <- 0 to 16) out.write(s)
    // SOF3
    out.write(0xff); out.write(0xc3); put16(out, 8 + 3 * channels)
    out.write(precision); put16(out, height); put16(out, width); out.write(channels)
    for (c <- 0 until channels) {
      out.write(c + 1); out.write(0x11); out.write(0)
    }
    // SOS: Ss = predictor, Se = 0, Al = point transform
    out.write(0xff); out.write(0xda); put16(out, 6 + 2 * channels)
    out.write(channels)
    for (c <- 0 until channels) { out.write(c + 1); out.write(0x00) }
    out.write(predictor); out.write(0); out.write(pt)

    val w = new BitWriter(out)
    val default = 1 << (precision - 1 - pt)
    val planes = Array.ofDim[Int](channels, width * height)
    var i = 0
    val n = width * height
    while (i < n) {
      val y = i / width; val x = i % width
      var ci = 0
      while (ci < channels) {
        val p = planes(ci)
        val v = px(y, x, ci) >> pt
        val pred =
          if (y == 0 && x == 0) default
          else if (x == 0) p((y - 1) * width)
          else if (y == 0) p(x - 1)
          else {
            val ra = p(y * width + x - 1)
            val rb = p((y - 1) * width + x)
            val rc = p((y - 1) * width + x - 1)
            predictor match {
              case 1 => ra
              case 2 => rb
              case 3 => rc
              case 4 => ra + rb - rc
              case 5 => ra + ((rb - rc) >> 1)
              case 6 => rb + ((ra - rc) >> 1)
              case 7 => (ra + rb) >> 1
            }
          }
        // modulo-2^16 difference, represented in [-32767, 32768] (H.1.2.1)
        var diff = (v - pred) & 0xffff
        if (diff > 32768) diff -= 65536
        if (diff == 32768) { w.bits(16, 5) } // SSSS 16: no appended bits
        else {
          val mag = math.abs(diff)
          var s = 0
          while ((mag >> s) != 0) s += 1
          w.bits(s, 5) // all categories live at 5 bits in our table
          if (s > 0) w.bits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        }
        p(y * width + x) = v
        ci += 1
      }
      i += 1
    }
    w.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}

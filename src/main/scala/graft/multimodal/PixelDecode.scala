package graft.multimodal

/** Real PIXEL decode for the multimodal path — closing the last stubbed
  * sliver (the reference keeps decode in its Python handlers; here it is
  * first-principles byte work plus the JDK's zlib):
  *
  *  - BMP: uncompressed 24-bit (BI_RGB), bottom-up or top-down, 4-byte row
  *    stride, BGR byte order — pure arithmetic over the pixel array; plus
  *    palette RLE at both widths (BI_RLE8 and nibble-packed BI_RLE4:
  *    encoded runs, absolute segments, EOL / EOF / delta escapes,
  *    bottom-up) expanded through the color table.
  *  - PNG (RFC 2083): 8- and 16-bit-depth gray / truecolor / gray+alpha /
  *    RGBA (16-bit samples big-endian, kept at full precision in the
  *    output grid), plus palette (color type 3) at bit depths 1/2/4/8
  *    with PLTE lookup
  *    to RGB — IDAT chunks concatenated, inflated with
  *    `java.util.zip.Inflater` (in the JDK, no new dependency), and each
  *    scanline de-filtered (None/Sub/Up/Average/Paeth). Both interlace
  *    layouts: sequential and Adam7 (seven independently-filtered
  *    sub-images scattered onto the frame grid).
  *  - JPEG: baseline/extended sequential AND progressive via
  *    [[JpegDecode]] — Huffman entropy decode (annex-G spectral
  *    selection + successive approximation for SOF2), dequantize, 8×8
  *    inverse DCT, chroma upsampling, YCbCr→RGB, all from the T.81 spec.
  *
  * Anything else (arithmetic-coded or 12-bit JPEG) returns None: at
  * corpus scale a decode stage quarantines what it cannot parse, it
  * never crashes the scan.
  */
object PixelDecode {

  /** Decode-bomb cap on header-declared geometry (width × height): frames
    * beyond 16.7 Mpixel (e.g. 4096×4096) quarantine rather than allocate —
    * allocation happens before entropy data is validated, and the OOM a
    * 34 GB plane request raises is an Error, not an Exception, so the
    * `catch` in decode() would not contain it. Shared with [[JpegDecode]].
    */
  val MaxPixels: Long = 1L << 24

  /** Decoded pixel grid: row-major samples, `channels` interleaved per
    * pixel, top row first. BMP is normalized to RGB order; PNG keeps its
    * native sample order (gray / RGB / gray+alpha / RGBA).
    */
  final case class Image(
      format: String, width: Int, height: Int, channels: Int,
      samples: Array[Int]) {
    /** Sample value at image row `r`, column `c`, channel `ch`. */
    def at(r: Int, c: Int, ch: Int): Int =
      samples((r * width + c) * channels + ch)
  }

  def decode(b: Array[Byte]): Option[Image] = {
    if (b == null) return None
    try {
      if (isBmp(b)) decodeBmp(b)
      else if (isPng(b)) decodePng(b)
      else if (isJpeg(b)) JpegDecode.decode(b)
      else None
    } catch { case _: Exception => None } // truncated/corrupt → quarantine
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  // ---- BMP ----

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  private def decodeBmp(b: Array[Byte]): Option[Image] = {
    if (le32(b, 14) < 40) return None          // need BITMAPINFOHEADER+
    (le16(b, 28), le32(b, 30)) match {
      case (24, 0) => decodeBmp24(b)           // BI_RGB truecolor
      case (8, 1) => decodeBmpRle(b, bits = 8) // BI_RLE8 palette
      case (4, 2) => decodeBmpRle(b, bits = 4) // BI_RLE4 palette
      case _ => None                           // 16-bit/… quarantine
    }
  }

  private def decodeBmp24(b: Array[Byte]): Option[Image] = {
    val off = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) return None
    val stride = ((w * 3 + 3) / 4) * 4         // rows padded to 4 bytes
    if (off.toLong + stride.toLong * h > b.length) return None
    val out = new Array[Int](w * h * 3)
    var r = 0
    while (r < h) {
      val fileRow = if (topDown) r else h - 1 - r // bottom-up by default
      val base = off + fileRow * stride
      var c = 0
      while (c < w) {
        val p = base + c * 3                   // stored B,G,R → emit R,G,B
        val o = (r * w + c) * 3
        out(o) = u8(b, p + 2)
        out(o + 1) = u8(b, p + 1)
        out(o + 2) = u8(b, p)
        c += 1
      }
      r += 1
    }
    Some(Image("bmp", w, h, 3, out))
  }

  /** BI_RLE8 / BI_RLE4 (MS BMP spec): palette indices, run-length
    * encoded. Encoded mode `(n>0, v)` repeats v n times — at 4 bits, v's
    * HIGH and LOW nibbles alternate across the run; escape `(0, 0)` ends
    * the scanline, `(0, 1)` ends the bitmap, `(0, 2, dx, dy)` skips
    * pixels (skipped cells stay at index 0 — the ImageIO convention),
    * `(0, n≥3)` runs n literal indices (nibble-packed MSB-first at 4
    * bits) padded to a word boundary. RLE bitmaps are bottom-up by
    * definition (negative height → malformed). Unlike BI_RGB, output
    * size is NOT bounded by input size (a 10-byte stream can claim a
    * huge frame filled by runs), so the PNG-side MaxPixels decode-bomb
    * guard applies here too.
    */
  private def decodeBmpRle(b: Array[Byte], bits: Int): Option[Image] = {
    val off = le32(b, 10)
    val w = le32(b, 18)
    val h = le32(b, 22)
    if (w <= 0 || h <= 0) return None          // RLE is bottom-up only
    if (w.toLong * h > MaxPixels) return None
    val maxColors = 1 << bits
    val nColors = { val cu = le32(b, 46); if (cu == 0) maxColors else cu }
    if (nColors < 1 || nColors > maxColors) return None
    val palOff = 14 + le32(b, 14)              // palette follows the info header
    if (palOff + 4 * nColors > b.length || off > b.length) return None
    val idx = new Array[Int](w * h)            // file-order rows, bottom-up
    var pos = off
    var x = 0
    var y = 0                                  // scanline index from the BOTTOM
    var done = false
    while (!done) {
      if (pos + 2 > b.length) return None      // truncated stream
      val n1 = u8(b, pos); val n2 = u8(b, pos + 1); pos += 2
      if (n1 > 0) {                            // encoded run
        if (y >= h || x + n1 > w) return None
        var i = 0
        while (i < n1) {
          idx(y * w + x) =
            if (bits == 8) n2
            else if ((i & 1) == 0) (n2 >>> 4) & 0xf
            else n2 & 0xf
          x += 1; i += 1
        }
      } else n2 match {
        case 0 => x = 0; y += 1                // end of line
        case 1 => done = true                  // end of bitmap
        case 2 =>                              // delta: skip right/up
          if (pos + 2 > b.length) return None
          x += u8(b, pos); y += u8(b, pos + 1); pos += 2
          if (x > w || y > h) return None
        case n =>                              // absolute: n literal indices
          if (y >= h || x + n > w) return None
          val nb = (n * bits + 7) / 8          // bytes holding the literals
          if (pos + nb > b.length) return None
          var i = 0
          while (i < n) {
            idx(y * w + x) =
              if (bits == 8) u8(b, pos + i)
              else (u8(b, pos + (i >> 1)) >>> (if ((i & 1) == 0) 4 else 0)) & 0xf
            x += 1; i += 1
          }
          pos += nb + (nb & 1)                 // pad to word boundary
      }
      if (y > h) return None
    }
    // palette lookup (stored B,G,R,reserved) with the bottom-up flip
    val out = new Array[Int](w * h * 3)
    var r = 0
    while (r < h) {
      val fy = h - 1 - r
      var c = 0
      while (c < w) {
        val v = idx(fy * w + c)
        if (v >= nColors) return None          // index past the palette
        val p = palOff + v * 4
        val o = (r * w + c) * 3
        out(o) = u8(b, p + 2)
        out(o + 1) = u8(b, p + 1)
        out(o + 2) = u8(b, p)
        c += 1
      }
      r += 1
    }
    Some(Image("bmp", w, h, 3, out))
  }

  // ---- PNG ----

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 33 && b.take(8).sameElements(pngSig)

  private def decodePng(b: Array[Byte]): Option[Image] = {
    if (be32(b, 8) != 13 || be32(b, 12) != 0x49484452) return None // IHDR first
    val w = be32(b, 16)
    val h = be32(b, 20)
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    if (u8(b, 26) != 0 || u8(b, 27) != 0) return None // compression/filter
    val interlace = u8(b, 28) // 0 = sequential, 1 = Adam7
    if (interlace != 0 && interlace != 1) return None
    val isPalette = colorType == 3
    if (isPalette) {
      // palette indices pack at sub-byte depths (1/2/4) or one per byte (8)
      if (bitDepth != 1 && bitDepth != 2 && bitDepth != 4 && bitDepth != 8)
        return None
    } else if (bitDepth != 8 && bitDepth != 16) return None
    val channels = colorType match {
      case 0 | 3 => 1 case 2 => 3 case 4 => 2 case 6 => 4 case _ => return None
    }
    if (w <= 0 || h <= 0) return None
    // Decode-bomb guard: header-declared geometry drives the allocations
    // below BEFORE any entropy data is validated, and an OutOfMemoryError
    // is an Error the quarantine catch can't intercept. A 50-byte stream
    // claiming 65535×65535 must return None, not kill the executor.
    if (w.toLong * h > MaxPixels) return None

    // concatenate IDAT chunk payloads and capture PLTE (chunk walk, CRCs
    // not re-verified — the inflater + expected-length check catch
    // corruption)
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var i = 33
    var sawEnd = false
    while (i + 8 <= b.length && !sawEnd) {
      val len = be32(b, i)
      val typ = be32(b, i + 4)
      if (len < 0 || i + 12 + len > b.length) return None
      if (typ == 0x49444154) idat.write(b, i + 8, len)        // IDAT
      else if (typ == 0x504c5445) {                           // PLTE
        if (len % 3 != 0 || len > 768) return None
        plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
      }
      else if (typ == 0x49454e44) sawEnd = true               // IEND
      i += 12 + len
    }
    if (idat.size() == 0) return None
    if (isPalette && plte == null) return None

    // Pass geometry: sequential = one full-frame pass; Adam7 (RFC 2083
    // §2.6) = seven sub-images at the spec's (rowStart, colStart,
    // rowStride, colStride), each stored as an INDEPENDENT image —
    // per-pass scanline width, per-pass filtering (the "above" row is the
    // previous row of the SAME pass), empty passes contribute zero bytes.
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1))
      else Array((0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
        (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1))
    def passW(cs: Int, cStride: Int): Int =
      if (w > cs) (w - cs + cStride - 1) / cStride else 0
    def passH(rs: Int, rStride: Int): Int =
      if (h > rs) (h - rs + rStride - 1) / rStride else 0
    // inflate to exactly Σ_pass ph·(1 filter byte + ceil(pw·bits/8)) —
    // filtering operates on BYTES whatever the bit depth (RFC 2083 §6)
    val expected = passes.map { case (rs, cs, rStr, cStr) =>
      val pw = passW(cs, cStr); val ph = passH(rs, rStr)
      if (pw == 0 || ph == 0) 0L
      else ph.toLong * (((pw.toLong * channels * bitDepth + 7) / 8) + 1)
    }.sum
    if (expected > Int.MaxValue) return None
    val raw = new Array[Byte](expected.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // n == 0 with needsInput → truncated stream; with needsDictionary
      // (zlib FDICT flag set in the 2-byte header) inflate() returns 0
      // forever without consuming input — without this exit a crafted
      // payload spins the executor task indefinitely
      if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
      got += n
    }
    inf.end()
    if (got != raw.length) return None

    // per-pass de-filter + scatter into the full-frame sample grid.
    // Sequential images are the degenerate single pass (strides 1), so
    // one code path serves both layouts; palette indices expand through
    // PLTE at scatter time (an out-of-range index is a malformed stream
    // → quarantine).
    val bpp = math.max(1, channels * bitDepth / 8) // filter stride in BYTES
    val outCh = if (isPalette) 3 else channels
    val mask = (1 << bitDepth) - 1
    val out = new Array[Int](w * h * outCh)
    var off = 0 // read cursor into the inflated stream
    var pi = 0
    while (pi < passes.length) {
      val (rs, cs, rStr, cStr) = passes(pi)
      val pw = passW(cs, cStr)
      val ph = passH(rs, rStr)
      if (pw > 0 && ph > 0) {
        val bpr = (pw * channels * bitDepth + 7) / 8
        val recon = new Array[Int](ph * bpr)
        var r = 0
        while (r < ph) {
          val filter = raw(off + r * (bpr + 1)) & 0xff
          var x = 0
          while (x < bpr) {
            val v = raw(off + r * (bpr + 1) + 1 + x) & 0xff
            val a = if (x >= bpp) recon(r * bpr + x - bpp) else 0
            val up = if (r > 0) recon((r - 1) * bpr + x) else 0
            val c = if (r > 0 && x >= bpp) recon((r - 1) * bpr + x - bpp) else 0
            val rec = filter match {
              case 0 => v
              case 1 => v + a
              case 2 => v + up
              case 3 => v + (a + up) / 2
              case 4 => // Paeth predictor
                val p = a + up - c
                val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
                v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
              case _ => return None
            }
            recon(r * bpr + x) = rec & 0xff
            x += 1
          }
          // scatter this pass row to frame row rs + r·rStr
          val fr = rs + r * rStr
          var pc2 = 0
          while (pc2 < pw) {
            val fc = cs + pc2 * cStr
            val o = (fr * w + fc) * outCh
            if (isPalette) {
              val bitPos = pc2 * bitDepth
              val v = (recon(r * bpr + (bitPos >> 3)) >>
                (8 - bitDepth - (bitPos & 7))) & mask
              if (v * 3 + 2 >= plte.length) return None
              out(o) = plte(v * 3) & 0xff
              out(o + 1) = plte(v * 3 + 1) & 0xff
              out(o + 2) = plte(v * 3 + 2) & 0xff
            } else {
              var ch = 0
              while (ch < channels) {
                out(o + ch) =
                  if (bitDepth == 8) recon(r * bpr + pc2 * channels + ch)
                  else // 16-bit: big-endian sample pairs (RFC 2083 §7.2)
                    (recon(r * bpr + (pc2 * channels + ch) * 2) << 8) |
                      recon(r * bpr + (pc2 * channels + ch) * 2 + 1)
                ch += 1
              }
            }
            pc2 += 1
          }
          r += 1
        }
        off += ph * (bpr + 1)
      }
      pi += 1
    }
    Some(Image("png", w, h, outCh, out))
  }

  /** Per-channel (sum, min, max) over an image's samples in one pass. */
  def channelStats(img: Image): Array[(Long, Int, Int)] = {
    val sums = new Array[Long](img.channels)
    val mins = Array.fill(img.channels)(Int.MaxValue) // 16-bit samples pass 255
    val maxs = Array.fill(img.channels)(0)
    var i = 0
    while (i < img.samples.length) {
      val ch = i % img.channels
      val v = img.samples(i)
      sums(ch) += v
      if (v < mins(ch)) mins(ch) = v
      if (v > maxs(ch)) maxs(ch) = v
      i += 1
    }
    Array.tabulate(img.channels)(ch => (sums(ch), mins(ch), maxs(ch)))
  }
}

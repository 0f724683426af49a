package graft.multimodal

import scala.collection.mutable

/** Baseline JPEG pixel decode from first principles (ITU-T T.81): marker
  * parse (DQT/DHT/SOF0/SOS/DRI), canonical Huffman entropy decode with DC
  * prediction + restart markers, dequantize + de-zigzag, 8×8 inverse DCT,
  * chroma upsampling for subsampled scans, and JFIF YCbCr→RGB. Closes the
  * one pixel-format gap [[PixelDecode]] had left ("JPEG needs a DCT
  * codec") with pure JVM arithmetic — no codec library.
  *
  * Scope: baseline sequential (SOF0), 8-bit, 1 or 3 components, any
  * sampling factors (4:4:4, 4:2:0, 4:2:2, …). Progressive (SOF2),
  * arithmetic coding, 12-bit, and hierarchical modes return None — the
  * quarantine contract of the decode stage.
  */
object JpegDecode {

  // zigzag order (the canonical 8x8 anti-diagonal scan) — computed, not
  // typed, so a transcription slip cannot corrupt the coefficient layout
  private val zz: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (s <- 0 until 15; // anti-diagonals
         r <- 0 to math.min(s, 7)
         if s - r <= 7) {
      val (row, col) = if (s % 2 == 0) (s - r, r) else (r, s - r)
      out(i) = row * 8 + col
      i += 1
    }
    out
  }

  /** Canonical Huffman table: (length, code) → symbol. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val map: mutable.HashMap[(Int, Int), Int] = {
      val m = new mutable.HashMap[(Int, Int), Int]()
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        var n = 0
        while (n < counts(len - 1)) {
          m.put((len, code), symbols(k)); k += 1; code += 1; n += 1
        }
        code <<= 1
      }
      m
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var sawMarker = false

    /** next entropy bit; byte-stuffed FF00 → FF; a real marker ends data */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw Truncated
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw Truncated
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed
          else { sawMarker = true; throw Truncated } // scan over-read
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }

    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }

    def decode(h: Huff): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | bit(); len += 1
        h.map.get((len, code)) match {
          case Some(s) => return s
          case None =>
        }
      }
      throw Truncated // invalid code
    }

    /** drop to a byte boundary and consume an expected RST marker */
    def restart(): Unit = {
      nbits = 0
      if (pos + 1 >= b.length) throw Truncated
      if ((b(pos) & 0xff) != 0xff) throw Truncated
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) throw Truncated
      pos += 2
    }
  }

  private object Truncated extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** 8×8 inverse DCT, direct double-precision definition (T.81 A.3.3). A
    * separable fast variant matters for throughput; the direct form is the
    * unambiguous reference and plenty for metadata/stats extraction.
    */
  private def idct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) 0.70710678118654752 else 1.0
            val cv = if (v == 0) 0.70710678118654752 else 1.0
            sum += cu * cv * block(v * 8 + u) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = sum / 4.0
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0; var ta = 0; var pred = 0
  }

  def decode(b: Array[Byte]): Option[PixelDecode.Image] = {
    try decodeImpl(b)
    catch { case _: Exception => None }
  }

  private def u8(b: Array[Byte], i: Int) = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int) = (u8(b, i) << 8) | u8(b, i + 1)

  private def decodeImpl(b: Array[Byte]): Option[PixelDecode.Image] = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    val qt = new Array[Array[Int]](4)
    val dcTables = new Array[Huff](4)
    val acTables = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return None
      val marker = u8(b, i + 1)
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) { i += 2 } // standalone
      else if (marker == 0xd9) return None // EOI before SOS
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < i + 2 + len) {
              val pq = u8(b, p) >> 4; val tq = u8(b, p) & 15
              if (pq != 0 || tq > 3) return None // 8-bit tables only
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(k) = u8(b, p + 1 + k); k += 1 }
              qt(tq) = t; p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < i + 2 + len) {
              val tc = u8(b, p) >> 4; val th = u8(b, p) & 15
              if (th > 3) return None
              val counts = Array.tabulate(16)(j => u8(b, p + 1 + j))
              val n = counts.sum
              val syms = Array.tabulate(n)(j => u8(b, p + 17 + j))
              val h = new Huff(counts, syms)
              if (tc == 0) dcTables(th) = h else acTables(th) = h
              p += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            if (u8(b, seg) != 8) return None // 8-bit precision only
            height = be16(b, seg + 1); width = be16(b, seg + 3)
            val nc = u8(b, seg + 5)
            if (nc != 1 && nc != 3) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + c * 3
              Component(u8(b, o), u8(b, o + 1) >> 4, u8(b, o + 1) & 15, u8(b, o + 2))
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4)) return None
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // non-baseline frame types: quarantine
          case 0xdd => restartInterval = be16(b, seg)
          case 0xda => // SOS — entropy data follows
            if (comps == null || width <= 0 || height <= 0) return None
            // Decode-bomb guard: SOF0 geometry drives the per-component
            // Double-plane allocations in decodeScan before any entropy
            // data is validated — a tiny stream claiming 65535×65535 would
            // request ~34 GB, and the resulting OutOfMemoryError is an
            // Error the quarantine catch cannot intercept. Cap shared with
            // PixelDecode's PNG path.
            if (width.toLong * height > PixelDecode.MaxPixels) return None
            val ns = u8(b, seg)
            if (ns != comps.length) return None
            var p = seg + 1
            for (_ <- 0 until ns) {
              val cid = u8(b, p)
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.td = u8(b, p + 1) >> 4; c.ta = u8(b, p + 1) & 15
              p += 2
            }
            p += 3 // Ss/Se/Ah|Al
            return decodeScan(b, p, width, height, comps, qt, dcTables,
              acTables, restartInterval)
          case _ => // APPn / COM / others: skip
        }
        i += 2 + len
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], start: Int, width: Int, height: Int,
      comps: Array[Component], qt: Array[Array[Int]],
      dcT: Array[Huff], acT: Array[Huff], restartInterval: Int)
      : Option[PixelDecode.Image] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component pixel planes at full MCU-padded resolution
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(ci => new Array[Double](planeW(ci) * planeH(ci))).toArray

    val r = new BitReader(b, start)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.restart()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qtab = qt(c.tq); if (qtab == null) return None
        val dct = dcT(c.td); val act = acT(c.ta)
        if (dct == null || act == null) return None
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // entropy-decode one 8x8 block
            val coef = new Array[Double](64)
            val s = r.decode(dct)
            val diff = extend(r.bits(s), s)
            c.pred += diff
            coef(0) = c.pred.toDouble * qtab(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = r.decode(act)
              val run = rs >> 4; val size = rs & 15
              if (rs == 0) eob = true
              else if (rs == 0xf0) k += 16
              else {
                k += run
                if (k > 63) return None
                coef(zz(k)) = extend(r.bits(size), size).toDouble * qtab(k)
                k += 1
              }
            }
            val px = idct(coef)
            // place into the component plane (level shift +128 deferred)
            val baseX = (mx * c.h + bx) * 8
            val baseY = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((baseY + yy) * planeW(ci) + baseX + xx) = px(yy * 8 + xx) + 128.0
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // assemble output: upsample subsampled planes by sample replication
    val nch = comps.length
    val out = new Array[Int](width * height * nch)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (nch == 1) {
          out(y * width + x) = clamp(planes(0)(y * planeW(0) + x))
        } else {
          def sample(ci: Int): Double = {
            val c = comps(ci)
            val sx = x * c.h / hMax; val sy = y * c.v / vMax
            planes(ci)(sy * planeW(ci) + sx)
          }
          val yv = sample(0); val cb = sample(1) - 128.0; val cr = sample(2) - 128.0
          val o = (y * width + x) * 3
          out(o) = clamp(yv + 1.402 * cr)
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yv + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Some(PixelDecode.Image("jpeg", width, height, nch, out))
  }
}

package graft.multimodal

/** The QM arithmetic coder of ITU-T T.81 (JPEG), Annex D (encoder) and
  * Annex F.2.2 (decoder): a binary adaptive arithmetic coder whose
  * probability estimation is a finite-state machine over Table D.3 —
  * per-context state is one byte (bit 7 = current MPS sense, bits 0-6 =
  * the Qe-table index). Interval arithmetic follows the integer
  * convention of §D.1.3: A is the interval size kept in [0x8000, 0x10000)
  * by renormalization, C accumulates the code point, and the byte stream
  * is BYTE-stuffed (a 0x00 after every 0xFF data byte) so entropy data
  * can never alias a marker.
  *
  * Subinterval layout (both sides must agree, §D.1.4/F.2.2.1): the MPS
  * owns the LOWER subinterval [0, A−Qe) and the LPS the upper [A−Qe, A),
  * with conditional exchange when A−Qe < Qe. MPS state updates happen
  * only on renormalization.
  *
  * The encoder and decoder here are exact inverses at the byte level
  * (QmCoderSpec round-trips random context/bit sequences); Table D.3's
  * published constants only steer ADAPTATION speed, so the inverse
  * property holds independently of them.
  */
object QmCoder {

  // Table D.3 (T.81): Qe value, Next_Index_MPS, Next_Index_LPS, Switch_MPS
  // for each of the 113 estimation states + the non-adapting state 113
  // (Qe ≈ 0.5, NMPS = NLPS = 113) used for uncontexted sign bits.
  val Qe: Array[Int] = Array(
    0x5a1d, 0x2586, 0x1114, 0x080b, 0x03d8, 0x01da, 0x00e5, 0x006f,
    0x0036, 0x001a, 0x000d, 0x0006, 0x0003, 0x0001, 0x5a7f, 0x3f25,
    0x2cf2, 0x207c, 0x17b9, 0x1182, 0x0cef, 0x09a1, 0x072f, 0x055c,
    0x0406, 0x0303, 0x0240, 0x01b1, 0x0144, 0x00f5, 0x00b7, 0x008a,
    0x0068, 0x004e, 0x003b, 0x002c, 0x5ae1, 0x484c, 0x3a0d, 0x2ef1,
    0x261f, 0x1f33, 0x19a8, 0x1518, 0x1177, 0x0e74, 0x0bfb, 0x09f8,
    0x0861, 0x0706, 0x05cd, 0x04de, 0x040f, 0x0363, 0x02d4, 0x025c,
    0x01f8, 0x01a4, 0x0160, 0x0125, 0x00f6, 0x00cb, 0x00ab, 0x008f,
    0x5b12, 0x4d04, 0x412c, 0x37d8, 0x2fe8, 0x293c, 0x2379, 0x1edf,
    0x1aa9, 0x174e, 0x1424, 0x119c, 0x0f6b, 0x0d51, 0x0bb6, 0x0a40,
    0x5832, 0x4d1c, 0x438e, 0x3bdd, 0x34ee, 0x2eae, 0x299a, 0x2516,
    0x5570, 0x4ca9, 0x44d9, 0x3e22, 0x3824, 0x32b4, 0x2e17, 0x56a8,
    0x4f46, 0x47e5, 0x41cf, 0x3c3d, 0x375e, 0x5231, 0x4c0f, 0x4639,
    0x415e, 0x5627, 0x50e7, 0x4b85, 0x5597, 0x504f, 0x5a10, 0x5522,
    0x59eb, 0x5a1d)
  // NOTE: rows 0-112 are the adaptive staircase; row 113 is the fixed
  // equiprobable state. Qe.length = 114.

  val Nmps: Array[Int] = Array(
    1, 14, 16, 18, 20, 23, 25, 28, 30, 33, 35, 9, 10, 12, 15, 36,
    38, 39, 40, 42, 43, 45, 46, 48, 49, 51, 52, 54, 56, 57, 59, 60,
    62, 63, 32, 33, 37, 64, 65, 67, 68, 69, 70, 72, 73, 74, 75, 77,
    78, 79, 48, 50, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 61, 61,
    65, 80, 81, 82, 83, 84, 86, 87, 87, 72, 72, 74, 74, 75, 77, 77,
    80, 88, 89, 90, 91, 92, 93, 86, 88, 95, 96, 97, 99, 99, 93, 95,
    101, 102, 103, 104, 99, 105, 106, 107, 103, 105, 108, 109, 110, 111,
    110, 112, 112, 113)

  val Nlps: Array[Int] = Array(
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 9, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 32,
    65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 77, 78, 79, 48,
    81, 82, 83, 84, 85, 86, 87, 71, 89, 90, 91, 92, 93, 94, 86, 96,
    97, 98, 99, 100, 93, 102, 103, 104, 99, 106, 107, 103, 109, 107,
    111, 109, 111, 113)

  val Switch: Array[Boolean] = {
    val s = new Array[Boolean](114)
    Seq(0, 14, 36, 64, 80, 88, 95, 105, 110, 112).foreach(s(_) = true)
    s
  }

  /** Fixed equiprobable state for sign bits: never adapts. */
  val FixedState: Int = 113

  /** Encoder (Annex D): feed decisions via [[encode]], then [[flush]].
    * Statistics live in the caller's `stats` array (one byte per context:
    * bit 7 = MPS, bits 0-6 = table index) so DC/AC models manage their
    * own context layout.
    */
  final class Enc {
    private val out = new java.io.ByteArrayOutputStream()
    private var a: Long = 0x10000L
    private var c: Long = 0L
    private var ct = 11 // 3 spacer bits + 8: first byte after 11 shifts
    private var buffer = -1 // last pending byte (may still take a carry)
    private var sc = 0L // run of pending 0xFF bytes between buffer and now

    private def emit(v: Int): Unit = {
      out.write(v & 0xff)
      if ((v & 0xff) == 0xff) out.write(0) // byte stuffing (§D.1.6)
    }

    private def byteOut(): Unit = {
      val t = (c >> 19).toInt
      if (t > 0xff) { // carry: ripples into buffer, turns stacked FFs to 00
        if (buffer >= 0) emit(buffer + 1)
        var i = 0L
        while (i < sc) { out.write(0); i += 1 }
        sc = 0
        buffer = t & 0xff // spacer bits guarantee this is not 0xFF
      } else if (t == 0xff) sc += 1 // hold: a later carry may consume it
      else {
        if (buffer >= 0) emit(buffer)
        while (sc > 0) { emit(0xff); sc -= 1 }
        buffer = t
      }
      c &= 0x7ffffL
      ct = 8
    }

    /** Code `bit` in context `cx` of `stats` (§D.1.4 with conditional
      * exchange; MPS estimate update only on renormalization).
      */
    def encode(stats: Array[Byte], cx: Int, bit: Int): Unit = {
      val s = stats(cx) & 0xff
      val idx = s & 0x7f
      val mps = s >>> 7
      val qe = Qe(idx)
      a -= qe
      if (bit == mps) {
        if (a >= 0x8000L) return // short path: no renorm, no adaptation
        if (a < qe) { c += a; a = qe } // exchange: MPS takes the upper part
        stats(cx) = ((mps << 7) | Nmps(idx)).toByte
      } else {
        if (a >= qe) { c += a; a = qe } // LPS upper part (no exchange)
        val nm = if (Switch(idx)) 1 - mps else mps
        stats(cx) = ((nm << 7) | Nlps(idx)).toByte
      }
      do {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
      } while (a < 0x8000L)
    }

    /** Terminate (§D.1.8): pick the code point in [C, C+A) with the most
      * trailing zeros, flush pending bytes, drop trailing zero bytes.
      */
    def flush(): Array[Byte] = {
      val t = (c + a - 1) & 0xffff0000L
      c = if (t < c) t + 0x8000L else t
      c <<= ct
      if ((c & 0xf8000000L) != 0) { // final carry
        if (buffer >= 0) emit(buffer + 1)
        var i = 0L
        while (i < sc) { out.write(0); i += 1 }
        sc = 0
      } else {
        if (buffer >= 0) emit(buffer)
        while (sc > 0) { emit(0xff); sc -= 1 }
      }
      // remaining significant bits of C (trailing zero bytes are dropped —
      // the decoder pads zeros past the terminating marker, §F.2.2.3)
      if ((c & 0x7fff800L) != 0) {
        emit(((c >> 19) & 0xff).toInt)
        if ((c & 0x7f800L) != 0) emit(((c >> 11) & 0xff).toInt)
      }
      out.toByteArray
    }
  }

  /** Decoder (Annex F.2.2) over `b[start..)`: entropy data ends at the
    * first marker (any 0xFF not followed by 0x00); from there on, zero
    * bytes are fed (§F.2.2.3) and [[pos]] points at the marker.
    */
  final class Dec(b: Array[Byte], start: Int) {
    private var p = start
    private var markerHit = false
    private var a: Long = 0x10000L
    private var c: Long = 0L
    private var ct = 0

    private def nextByte(): Int = {
      if (markerHit || p >= b.length) { markerHit = true; return 0 }
      val v = b(p) & 0xff
      if (v != 0xff) { p += 1; v }
      else if (p + 1 < b.length && (b(p + 1) & 0xff) == 0x00) { p += 2; 0xff }
      else { markerHit = true; 0 } // marker: stay put, feed zeros
    }

    // initialize Chigh (bits 16-31) with the first 16 data bits
    c = (nextByte().toLong << 24) | (nextByte().toLong << 16)

    /** Offset of the terminating marker's 0xFF (valid once decoding has
      * consumed the scan; callers resume the marker walk here).
      */
    def pos: Int = p

    private def renorm(): Unit = {
      do {
        if (ct == 0) { c += nextByte().toLong << 8; ct = 8 }
        a <<= 1; c <<= 1; ct -= 1
      } while (a < 0x8000L)
    }

    /** Decode one decision in context `cx` of `stats` — the exact mirror
      * of [[Enc.encode]]'s interval split and estimation updates.
      */
    def decode(stats: Array[Byte], cx: Int): Int = {
      val s = stats(cx) & 0xff
      val idx = s & 0x7f
      val mps = s >>> 7
      val qe = Qe(idx)
      a -= qe
      val chigh = c >>> 16
      if (chigh < a) {
        if (a >= 0x8000L) return mps // short path, mirrors the encoder's
        val d =
          if (a < qe) { // exchange: lower subinterval is the LPS
            val nm = if (Switch(idx)) 1 - mps else mps
            stats(cx) = ((nm << 7) | Nlps(idx)).toByte
            1 - mps
          } else {
            stats(cx) = ((mps << 7) | Nmps(idx)).toByte
            mps
          }
        renorm()
        d
      } else {
        c -= a << 16 // move to the upper subinterval's origin
        val d =
          if (a < qe) { // exchange: upper subinterval is the MPS
            stats(cx) = ((mps << 7) | Nmps(idx)).toByte
            a = qe
            mps
          } else {
            val nm = if (Switch(idx)) 1 - mps else mps
            stats(cx) = ((nm << 7) | Nlps(idx)).toByte
            a = qe
            1 - mps
          }
        renorm()
        d
      }
    }
  }
}

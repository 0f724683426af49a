package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Arithmetic-coded JPEG (SOF9): the QM coder's exact-inverse property,
  * byte-stream discipline, and the full encode→decode pixel loop.
  * Validation strategy: the encoder (Annex D flowcharts) and decoder
  * (Annex F flowcharts) are structurally independent implementations —
  * byte-level round-trip agreement across adversarial decision sequences
  * is the inverse-consistency proof; pixel agreement with the generating
  * image bounds the whole DCT/quant/entropy pipeline. (No external
  * arithmetic-JPEG producer exists in this environment — ImageIO cannot
  * write SOF9 — so spec-fidelity of the Table D.3 constants is exercised
  * structurally, not by interop.)
  */
class JpegArithSpec extends AnyFunSuite {

  test("Table D.3 structural invariants (probabilities and transitions stay in range)") {
    assert(QmCoder.Qe.length === 114)
    assert(QmCoder.Nmps.length === 114 && QmCoder.Nlps.length === 114)
    assert(QmCoder.Qe.forall(q => q > 0 && q < 0x8000),
      "every Qe must be a valid LPS probability below half the interval")
    assert(QmCoder.Nmps.forall(i => i >= 0 && i < 114))
    assert(QmCoder.Nlps.forall(i => i >= 0 && i < 114))
    // switch states flip the MPS sense — they only make sense where the
    // LPS estimate has crossed half (Qe > 0x5555); the converse is not an
    // iff in the published table (row 108, 0x5597, adapts without a flip)
    for (i <- 0 until 113 if QmCoder.Switch(i))
      assert(QmCoder.Qe(i) > 0x5555,
        s"switch row $i has implausible Qe=0x${QmCoder.Qe(i).toHexString}")
    for (i <- 0 until 113 if QmCoder.Qe(i) <= 0x5555)
      assert(!QmCoder.Switch(i),
        s"row $i below half must not flip: Qe=0x${QmCoder.Qe(i).toHexString}")
    // the fixed sign state never adapts
    assert(QmCoder.Nmps(113) === 113 && QmCoder.Nlps(113) === 113 &&
      !QmCoder.Switch(113))
  }

  test("QM coder round-trips adversarial decision sequences byte-exactly") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 30) {
      val nCtx = 1 + rnd.nextInt(16)
      val n = rnd.nextInt(3000)
      // decision streams with varied skew: heavily-MPS, alternating, fair
      val bias = trial % 3 match {
        case 0 => 0.95; case 1 => 0.5; case 2 => 0.02
      }
      val cxs = Array.fill(n)(rnd.nextInt(nCtx))
      val bits = Array.fill(n)(if (rnd.nextDouble() < bias) 1 else 0)
      val encStats = new Array[Byte](nCtx)
      val enc = new QmCoder.Enc
      var i = 0
      while (i < n) { enc.encode(encStats, cxs(i), bits(i)); i += 1 }
      val bytes = enc.flush()
      // byte-stream discipline: every 0xFF data byte is stuffed
      for (j <- 0 until bytes.length - 1 if (bytes(j) & 0xff) == 0xff)
        assert((bytes(j + 1) & 0xff) == 0x00, s"unstuffed FF at $j (trial $trial)")
      // append a marker so the decoder exercises its zero-feed tail too
      val withMarker = bytes ++ Array(0xff.toByte, 0xd9.toByte)
      val decStats = new Array[Byte](nCtx)
      val dec = new QmCoder.Dec(withMarker, 0)
      i = 0
      while (i < n) {
        assert(dec.decode(decStats, cxs(i)) === bits(i),
          s"trial $trial: decision $i of $n diverged")
        i += 1
      }
      // adaptation state must track identically on both sides
      assert(decStats.toSeq === encStats.toSeq, s"trial $trial: state drift")
    }
  }

  private def gradient(w: Int, h: Int, id: Long)(y: Int, x: Int, ch: Int): Int =
    math.min(32 + (id % 16).toInt + 2 * y + 2 * x + 3 * ch, 255)

  test("full SOF9 round-trip: near-lossless quant recovers the source within DCT slack") {
    for ((w, h, id) <- Seq((16, 16, 0L), (24, 16, 7L), (17, 13, 3L))) {
      val bytes = JpegArithEncode.encode(w, h, 3, gradient(w, h, id), quant = 1)
      val img = JpegDecode.decode(bytes)
        .getOrElse(fail(s"decode failed at ${w}x$h"))
      assert(img.width === w && img.height === h && img.channels === 3)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        maxDiff = math.max(maxDiff,
          math.abs(img.at(y, x, c) - gradient(w, h, id)(y, x, c)))
      // quant=1: the only loss is float DCT + YCbCr rounding
      assert(maxDiff <= 2, s"${w}x$h: max |decoded - source| = $maxDiff")
    }
  }

  test("12-bit SOF9 round-trips at full precision (samples beyond 8-bit range)") {
    val (w, h) = (24, 16)
    // deliberately exceeds 255 everywhere: an 8-bit clamp would flatten it
    def px12(y: Int, x: Int, ch: Int): Int =
      math.min(512 + y * 64 + x * 32 + ch * 128, 4095)
    val bytes = JpegArithEncode.encode(w, h, 3, px12, quant = 1, precision = 12)
    val img = JpegDecode.decode(bytes).getOrElse(fail("12-bit decode failed"))
    assert(img.width === w && img.height === h && img.channels === 3)
    var maxDiff = 0
    var sawBig = false
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      maxDiff = math.max(maxDiff, math.abs(img.at(y, x, c) - px12(y, x, c)))
      if (img.at(y, x, c) > 255) sawBig = true
    }
    assert(sawBig, "12-bit output must carry values beyond the 8-bit range")
    assert(maxDiff <= 3, s"12-bit max |decoded - source| = $maxDiff")
  }

  test("grayscale and coarse quant stay near the source on smooth content") {
    val (w, h) = (32, 24)
    def px(y: Int, x: Int, ch: Int): Int = math.min(40 + y * 3 + x * 2, 255)
    val bytes = JpegArithEncode.encode(w, h, 1, px, quant = 8)
    val img = JpegDecode.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.channels === 1)
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += math.abs(img.at(y, x, 0) - px(y, x, 0))
    val mean = sum.toDouble / (w * h)
    assert(mean <= 3.0, s"mean |diff| = $mean at quant 8")
  }

  test("restart markers reset the coder and statistics (round-trip with DRI)") {
    val (w, h) = (40, 24) // 5x3 MCUs at 4:4:4 → several restart segments
    val bytes = JpegArithEncode.encode(w, h, 3, gradient(w, h, 5L),
      quant = 2, restartInterval = 4)
    // the stream really contains RST markers
    val hasRst = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "encoder must emit RSTn at the requested interval")
    val img = JpegDecode.decode(bytes).getOrElse(fail("restart decode failed"))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      maxDiff = math.max(maxDiff,
        math.abs(img.at(y, x, c) - gradient(w, h, 5L)(y, x, c)))
    assert(maxDiff <= 4, s"max |diff| across restart segments = $maxDiff")
  }

  test("arithmetic PROGRESSIVE (SOF10) round-trips through the annex-G scan script") {
    for ((w, h, id) <- Seq((16, 16, 0L), (24, 16, 7L), (17, 13, 3L))) {
      val bytes = JpegArithEncode.encodeProgressive(w, h, 3,
        gradient(w, h, id), quant = 1)
      // it really is an arithmetic progressive frame with 8 scans
      assert(bytes.indexOfSlice(Array(0xff.toByte, 0xca.toByte)) >= 0)
      assert(bytes.sliding(2).count(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda) === 8)
      val img = JpegDecode.decode(bytes)
        .getOrElse(fail(s"SOF10 decode failed at ${w}x$h"))
      assert(img.width === w && img.height === h && img.channels === 3)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        maxDiff = math.max(maxDiff,
          math.abs(img.at(y, x, c) - gradient(w, h, id)(y, x, c)))
      // DC+AC successive approximation must reassemble the exact
      // coefficients: only DCT/YCbCr float slack remains
      assert(maxDiff <= 2, s"${w}x$h SOF10: max |decoded - source| = $maxDiff")
    }
    // grayscale + 12-bit progressive
    def px12(y: Int, x: Int, ch: Int): Int = math.min(600 + y * 40 + x * 24, 4095)
    val g12 = JpegArithEncode.encodeProgressive(24, 16, 1, px12, quant = 1,
      precision = 12)
    val img12 = JpegDecode.decode(g12).getOrElse(fail("12-bit SOF10 failed"))
    var bad = 0
    for (y <- 0 until 16; x <- 0 until 24)
      if (math.abs(img12.at(y, x, 0) - px12(y, x, 0)) > 3) bad += 1
    assert(bad === 0, s"$bad samples off by >3 in 12-bit progressive")
  }

  test("hierarchical (DHP + SOF9 + differential SOF13) refines a coarse frame to near-lossless") {
    for ((w, h, id) <- Seq((16, 16, 0L), (24, 16, 7L), (17, 13, 3L))) {
      // base frame at BRUTALLY coarse quant: alone it is visibly wrong;
      // the differential frame must close the gap to residual-DCT slack
      val bytes = JpegArithEncode.encodeHierarchical(w, h, 3,
        gradient(w, h, id), quantBase = 32)
      assert(bytes.indexOfSlice(Array(0xff.toByte, 0xde.toByte)) >= 0) // DHP
      assert(bytes.indexOfSlice(Array(0xff.toByte, 0xc9.toByte)) >= 0)
      assert(bytes.indexOfSlice(Array(0xff.toByte, 0xcd.toByte)) >= 0)
      val img = JpegDecode.decode(bytes)
        .getOrElse(fail(s"hierarchical decode failed at ${w}x$h"))
      assert(img.width === w && img.height === h && img.channels === 3)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        maxDiff = math.max(maxDiff,
          math.abs(img.at(y, x, c) - gradient(w, h, id)(y, x, c)))
      assert(maxDiff <= 3, s"${w}x$h hierarchical: max |diff| = $maxDiff")
      // the coarse base ALONE must be visibly worse — otherwise the
      // differential frame proved nothing (truncate before SOF13 + EOI)
      val cut = bytes.indexOfSlice(Array(0xff.toByte, 0xcd.toByte))
      val baseOnly = bytes.take(cut) ++ Array(0xff.toByte, 0xd9.toByte)
      JpegDecode.decode(baseOnly).foreach { coarse =>
        var coarseMax = 0
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          coarseMax = math.max(coarseMax,
            math.abs(coarse.at(y, x, c) - gradient(w, h, id)(y, x, c)))
        assert(coarseMax > maxDiff,
          s"quant-32 base alone ($coarseMax) should be worse than refined ($maxDiff)")
      }
    }
    // grayscale + 12-bit hierarchical
    def px12(y: Int, x: Int, ch: Int): Int = math.min(600 + y * 40 + x * 24, 4095)
    val g12 = JpegArithEncode.encodeHierarchical(24, 16, 1, px12,
      quantBase = 32, precision = 12)
    val img12 = JpegDecode.decode(g12).getOrElse(fail("12-bit hierarchical failed"))
    for (y <- 0 until 16; x <- 0 until 24)
      assert(math.abs(img12.at(y, x, 0) - px12(y, x, 0)) <= 3)
  }

  test("EXP pyramids and non-arithmetic differential frames stay quarantined") {
    val bytes = JpegArithEncode.encodeHierarchical(16, 16, 3,
      gradient(16, 16, 1L), quantBase = 16)
    // splice an EXP segment before the differential frame
    val cut = bytes.indexOfSlice(Array(0xff.toByte, 0xcd.toByte))
    val exp = Array(0xff.toByte, 0xdf.toByte, 0x00.toByte, 0x03.toByte, 0x10.toByte)
    val withExp = bytes.take(cut) ++ exp ++ bytes.drop(cut)
    assert(JpegDecode.decode(withExp).isEmpty,
      "EXP (resolution pyramid) must quarantine, not mis-scale")
    // a Huffman differential frame marker (SOF5) quarantines
    val patched = bytes.clone()
    patched(cut + 1) = 0xc5.toByte
    assert(JpegDecode.decode(patched).isEmpty)
    // a differential frame with NO hierarchical context quarantines
    val seq = JpegArithEncode.encode(16, 16, 3, gradient(16, 16, 1L), quant = 1)
    val sofAt = seq.indexOfSlice(Array(0xff.toByte, 0xc9.toByte))
    val noDhp = seq.clone()
    noDhp(sofAt + 1) = 0xcd.toByte
    assert(JpegDecode.decode(noDhp).isEmpty)
    // arithmetic-differential-PROGRESSIVE (SOF14) also stays quarantined
    val p14 = bytes.clone()
    p14(cut + 1) = 0xce.toByte
    assert(JpegDecode.decode(p14).isEmpty)
  }

  test("truncated and corrupted arithmetic streams quarantine, never throw") {
    val bytes = JpegArithEncode.encode(16, 16, 3, gradient(16, 16, 2L), quant = 1)
    for (cut <- Seq(bytes.length / 4, bytes.length / 2, bytes.length - 3)) {
      // may decode (zero-fed tail) or quarantine — must not throw
      JpegDecode.decode(bytes.take(cut))
    }
    val garbled = bytes.clone()
    for (j <- bytes.length / 2 until math.min(bytes.length / 2 + 16, garbled.length))
      garbled(j) = 0x55
    JpegDecode.decode(garbled) // adaptation diverges; must stay contained
  }
}

package graft.multimodal

import graft.SparkTestBase

/** Baseline-JPEG decoder spec over HAND-CRAFTED streams: tiny custom
  * Huffman tables make the entropy bits writable by hand, and expected
  * pixels come either from closed-form DCT facts (a DC-only block decodes
  * flat to dc·q/8 + 128) or from an independent re-statement of the IDCT
  * formula inside the test.
  */
class JpegDecodeSpec extends SparkTestBase {

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload

  private def dqt(id: Int, q: Array[Int]): Array[Byte] =
    seg(0xdb, Array(id.toByte) ++ q.map(_.toByte))

  private def dht(cls: Int, id: Int, counts: Array[Int], syms: Array[Int]): Array[Byte] =
    seg(0xc4, Array(((cls << 4) | id).toByte) ++ counts.map(_.toByte) ++ syms.map(_.toByte))

  /** comps: (id, hSamp, vSamp, qtId) */
  private def sof0(w: Int, h: Int, comps: Seq[(Int, Int, Int, Int)]): Array[Byte] =
    seg(0xc0, Array(8.toByte,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      comps.length.toByte) ++
      comps.flatMap { case (id, hh, vv, tq) =>
        Seq(id.toByte, ((hh << 4) | vv).toByte, tq.toByte) })

  /** comps: (id, dcTable, acTable) */
  private def sos(comps: Seq[(Int, Int, Int)]): Array[Byte] =
    seg(0xda, Array(comps.length.toByte) ++
      comps.flatMap { case (id, td, ta) => Seq(id.toByte, ((td << 4) | ta).toByte) } ++
      Array(0.toByte, 63.toByte, 0.toByte))

  /** bit string → bytes, 1-padded to a byte boundary, FF byte-stuffed */
  private def entropy(bitString: String): Array[Byte] = {
    val padded = bitString + "1" * ((8 - bitString.length % 8) % 8)
    padded.grouped(8).flatMap { byte =>
      val v = Integer.parseInt(byte, 2)
      if (v == 0xff) Seq(0xff.toByte, 0x00.toByte) else Seq(v.toByte)
    }.toArray
  }

  private val SOI = Array(0xff.toByte, 0xd8.toByte)
  private val EOI = Array(0xff.toByte, 0xd9.toByte)
  private val flatQ = Array.fill(64)(8) // uniform quant of 8

  // DC table: '0' → category 5, '10' → category 0
  private val dcT = dht(0, 0, Array(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), Array(5, 0))
  // AC table: '0' → EOB (0x00), '10' → run 0 / size 5 (0x05)
  private val acT = dht(1, 0, Array(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), Array(0x00, 0x05))

  // with q=8: a DC diff of 16 (category 5, bits 10000) makes the block
  // decode flat to 16*8/8 + 128 = 144
  private val dcBlock16 = "0" + "10000" + "0" // dc cat5, +16, EOB
  private val dcBlock0 = "10" + "0"           // dc cat0 (diff 0), EOB

  test("grayscale 8x8 DC-only block decodes flat (huffman + dequant + idct + shift)") {
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof0(8, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      entropy(dcBlock16) ++ EOI
    val img = PixelDecode.decode(bytes).get
    assert((img.format, img.width, img.height, img.channels) === (("jpeg", 8, 8, 1)))
    assert(img.samples.forall(_ === 144), img.samples.take(8).toSeq)
  }

  test("two MCUs carry the DC prediction chain") {
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof0(16, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      entropy(dcBlock16 + dcBlock16) ++ EOI // second diff also +16 → dc 32
    val img = PixelDecode.decode(bytes).get
    assert(img.width === 16)
    assert(img.at(3, 3, 0) === 144)  // left block: dc 16
    assert(img.at(3, 11, 0) === 160) // right block: dc 16+16 → 32*8/8+128
  }

  test("4:4:4 color: flat Y with zero chroma is neutral gray through YCbCr") {
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof0(8, 8, Seq((1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0))) ++
      sos(Seq((1, 0, 0), (2, 0, 0), (3, 0, 0))) ++
      entropy(dcBlock16 + dcBlock0 + dcBlock0) ++ EOI
    val img = PixelDecode.decode(bytes).get
    assert(img.channels === 3)
    for (ch <- 0 until 3) assert(img.at(4, 4, ch) === 144)
  }

  test("4:2:0: four Y blocks per MCU with chroma upsampled by replication") {
    // Y diffs +16 per block → quadrant grays 144/160/176/192 (raster block
    // order inside the MCU); Cb/Cr zero
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof0(16, 16, Seq((1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0))) ++
      sos(Seq((1, 0, 0), (2, 0, 0), (3, 0, 0))) ++
      entropy(dcBlock16 * 4 + dcBlock0 + dcBlock0) ++ EOI
    val img = PixelDecode.decode(bytes).get
    assert((img.width, img.height, img.channels) === ((16, 16, 3)))
    assert(img.at(2, 2, 0) === 144)   // top-left Y block
    assert(img.at(2, 10, 0) === 160)  // top-right
    assert(img.at(10, 2, 0) === 176)  // bottom-left
    assert(img.at(10, 10, 0) === 192) // bottom-right
    for (ch <- 1 until 3) assert(img.at(5, 5, ch) === img.at(5, 5, 0)) // gray
  }

  test("an AC coefficient reproduces the cosine basis (independent IDCT)") {
    // dc 0, then AC run 0 / size 5 with bits 10000 → coefficient +16 at
    // zigzag index 1 = (row 0, col 1), dequantized to 128
    val block = "10" + "10" + "10000" + "0"
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof0(8, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      entropy(block) ++ EOI
    val img = PixelDecode.decode(bytes).get
    // independent statement of the T.81 IDCT for a single (u=1, v=0) coef
    def expected(x: Int, y: Int): Int = {
      val v = (0.70710678118654752 * 128.0 *
        math.cos((2 * x + 1) * 1 * math.Pi / 16)) / 4.0 + 128.0
      math.max(0, math.min(255, math.round(v).toInt))
    }
    for (y <- 0 until 8; x <- 0 until 8)
      assert(img.at(y, x, 0) === expected(x, y), s"($x,$y)")
  }

  test("restart markers reset the DC prediction") {
    val dri = seg(0xdd, Array(0.toByte, 1.toByte)) // restart every 1 MCU
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++ dri ++
      sof0(16, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      entropy(dcBlock16) ++ Array(0xff.toByte, 0xd0.toByte) ++
      entropy(dcBlock16) ++ EOI
    val img = PixelDecode.decode(bytes).get
    assert(img.at(3, 3, 0) === 144)
    assert(img.at(3, 11, 0) === 144) // prediction reset → dc 16 again
  }

  test("12-bit extended sequential (SOF1): level shift, clamp, and 16-bit DQT scale with precision") {
    def sofExt(marker: Int, prec: Int): Array[Byte] =
      seg(marker, Array(prec.toByte, 0, 8, 0, 8, 1, 1, 0x11.toByte, 0))
    // 8-bit DQT, q=8: DC diff 16 → flat 16·8/8 + 2048 = 2064 (12-bit shift)
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sofExt(0xc1, 12) ++ sos(Seq((1, 0, 0))) ++ entropy(dcBlock16) ++ EOI
    val img = PixelDecode.decode(bytes).get
    assert((img.width, img.height, img.channels) === ((8, 8, 1)))
    assert(img.samples.forall(_ === 2064), img.samples.take(8).toSeq)
    // 16-bit DQT entries (pq=1, q=300 — impossible in an 8-bit table):
    // DC diff 16 → 16·300/8 + 2048 = 2648
    val dqt16 = seg(0xdb, Array(0x10.toByte) ++
      Array.fill(64)(300).flatMap(v => Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)))
    val bytes16 = SOI ++ dqt16 ++ dcT ++ acT ++
      sofExt(0xc1, 12) ++ sos(Seq((1, 0, 0))) ++ entropy(dcBlock16) ++ EOI
    assert(PixelDecode.decode(bytes16).get.samples.forall(_ === 2648))
    // BASELINE (SOF0) is 8-bit by definition: a 12-bit SOF0 quarantines
    val base12 = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sofExt(0xc0, 12) ++ sos(Seq((1, 0, 0))) ++ entropy(dcBlock16) ++ EOI
    assert(PixelDecode.decode(base12).isEmpty)
  }

  test("non-supported and corrupt streams quarantine (None), never throw") {
    // a MALFORMED arithmetic-progressive scan: SOF10 decodes since round
    // 13 (JpegArithSpec), but a full-band Ss=0..Se=63 progressive scan is
    // illegal (DC and AC never share a scan) and must quarantine
    val arithProg = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      seg(0xca, sof0(8, 8, Seq((1, 1, 1, 0))).drop(4)) ++ sos(Seq((1, 0, 0)))
    assert(PixelDecode.decode(arithProg).isEmpty)
    // truncated entropy data (scan promises one block, delivers none —
    // the decoder hits EOI mid-block)
    val short = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof0(8, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++ EOI
    assert(PixelDecode.decode(short).isEmpty)
    // a progressive stream whose only scan is truncated also quarantines
    val progShort = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      seg(0xc2, sof0(8, 8, Seq((1, 1, 1, 0))).drop(4)) ++ sos(Seq((1, 0, 0)))
    assert(PixelDecode.decode(progShort).isEmpty)
    // garbage after SOI
    assert(PixelDecode.decode(SOI ++ Array.fill(16)(0x33.toByte)).isEmpty)
  }

  // ---- progressive (SOF2) ----

  /** SOS with explicit spectral selection / successive approximation */
  private def sosP(comps: Seq[(Int, Int, Int)], ss: Int, se: Int,
      ah: Int, al: Int): Array[Byte] =
    seg(0xda, Array(comps.length.toByte) ++
      comps.flatMap { case (id, td, ta) => Seq(id.toByte, ((td << 4) | ta).toByte) } ++
      Array(ss.toByte, se.toByte, ((ah << 4) | al).toByte))

  private def sof2(w: Int, h: Int, comps: Seq[(Int, Int, Int, Int)]): Array[Byte] =
    seg(0xc2, sof0(w, h, comps).drop(4))

  test("progressive: DC scan + AC-EOB scan reconstructs the flat baseline block") {
    // scan 1: DC band, no approximation (+16 → dequant 128 → flat 144);
    // scan 2: AC band 1..63, immediate EOB
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof2(8, 8, Seq((1, 1, 1, 0))) ++
      sosP(Seq((1, 0, 0)), 0, 0, 0, 0) ++ entropy("0" + "10000") ++
      sosP(Seq((1, 0, 0)), 1, 63, 0, 0) ++ entropy("0") ++ EOI
    val img = PixelDecode.decode(bytes).get
    assert((img.format, img.width, img.height, img.channels) === (("jpeg", 8, 8, 1)))
    assert(img.samples.forall(_ === 144), img.samples.take(8).toSeq)
  }

  test("progressive: successive approximation accumulates DC bits across scans") {
    // scan 1: DC at Al=1 (+16 << 1 = 32); scan 2: AC EOB; scan 3: DC
    // refinement (Ah=1, Al=0) appends bit 1 → coefficient 33 → flat 161
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof2(8, 8, Seq((1, 1, 1, 0))) ++
      sosP(Seq((1, 0, 0)), 0, 0, 0, 1) ++ entropy("0" + "10000") ++
      sosP(Seq((1, 0, 0)), 1, 63, 0, 0) ++ entropy("0") ++
      sosP(Seq((1, 0, 0)), 0, 0, 1, 0) ++ entropy("1") ++ EOI
    val img = PixelDecode.decode(bytes).get
    assert(img.samples.forall(_ === 161), img.samples.take(8).toSeq)
  }

  test("progressive: AC spectral band lands the cosine basis coefficient") {
    // DC zero, then an AC scan placing +16 at zigzag 1 — same expected
    // surface as the baseline AC test
    val bytes = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof2(8, 8, Seq((1, 1, 1, 0))) ++
      sosP(Seq((1, 0, 0)), 0, 0, 0, 0) ++ entropy("10") ++
      sosP(Seq((1, 0, 0)), 1, 63, 0, 0) ++ entropy("10" + "10000" + "0") ++ EOI
    val img = PixelDecode.decode(bytes).get
    def expected(x: Int, y: Int): Int = {
      val v = (0.70710678118654752 * 128.0 *
        math.cos((2 * x + 1) * 1 * math.Pi / 16)) / 4.0 + 128.0
      math.max(0, math.min(255, math.round(v).toInt))
    }
    for (y <- 0 until 8; x <- 0 until 8)
      assert(img.at(y, x, 0) === expected(x, y), s"($x,$y)")
  }

  test("cross-codec progressive: ImageIO MODE_DEFAULT script decodes within IDCT rounding") {
    // 56×40 at the JDK's default 4:2:0 makes the Y component's true block
    // grid (7×5) SMALLER than the MCU-padded storage grid (8×6), so the
    // non-interleaved AC scans must walk component-raster geometry — the
    // distinction T.81 A.2.2 draws and padding-grid walks get wrong
    val w = 56; val h = 40
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / (w - 1)
      val g = (y * 255) / (h - 1)
      val b = ((x + y) * 255) / (w + h - 2)
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.95f)
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), params)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    // the writer must actually have emitted SOF2, or this test tests nothing
    assert((2 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
      "ImageIO did not emit a progressive (SOF2) stream")

    val mine = PixelDecode.decode(bytes).get
    assert((mine.width, mine.height, mine.channels) === ((w, h, 3)))
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxD = 0; var sum = 0L
    for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3) {
      val d = math.abs(mine.at(y, x, ch) -
        ((theirs.getRGB(x, y) >> ((2 - ch) * 8)) & 0xff))
      maxD = math.max(maxD, d); sum += d
    }
    val mean = sum.toDouble / (w * h * 3)
    assert(maxD <= 8, s"max per-sample diff $maxD vs ImageIO")
    assert(mean <= 2.0, f"mean per-sample diff $mean%.3f vs ImageIO")
    // and vs the pre-encode source (quality 0.95 → ~1 count/sample loss)
    var srcSum = 0L
    for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3)
      srcSum += math.abs(mine.at(y, x, ch) -
        ((src.getRGB(x, y) >> ((2 - ch) * 8)) & 0xff))
    assert(srcSum.toDouble / (w * h * 3) <= 3.0, "diverged from encoded source")
  }

  test("cross-codec: decodes a REAL ImageIO-encoded stream within IDCT rounding of ImageIO's reader") {
    // the JDK ships a full JPEG codec (javax.imageio): encode a gradient
    // with it, then decode the SAME bytes with both readers. Two correct
    // implementations of T.81 may differ only by IDCT/rounding slack —
    // a table, zigzag, prediction, or upsampling bug would diverge wildly.
    val w = 64; val h = 48
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / (w - 1)
      val g = (y * 255) / (h - 1)
      val b = ((x + y) * 255) / (w + h - 2)
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.95f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), params)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray

    val mine = PixelDecode.decode(bytes).get
    assert((mine.width, mine.height, mine.channels) === ((w, h, 3)))
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    def stats(ref: (Int, Int, Int) => Int): (Int, Double) = {
      var maxD = 0; var sum = 0L
      for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3) {
        val d = math.abs(mine.at(y, x, ch) - ref(x, y, ch))
        maxD = math.max(maxD, d); sum += d
      }
      (maxD, sum.toDouble / (w * h * 3))
    }
    // slack sources between two CORRECT decoders: ImageIO interpolates
    // chroma upsampling (we replicate, as T.81 permits) and uses a scaled
    // integer IDCT; measured max 5 / mean ~1.1 on this gradient — a
    // structural bug (tables, zigzag, prediction, color matrix) shows up
    // as max ≥ 50 and mean ≥ 10
    val (maxIo, meanIo) = stats((x, y, ch) => (theirs.getRGB(x, y) >> ((2 - ch) * 8)) & 0xff)
    assert(maxIo <= 8, s"max per-sample diff $maxIo vs ImageIO")
    assert(meanIo <= 2.0, f"mean per-sample diff $meanIo%.3f vs ImageIO")
    // and the decode must approximate what was ENCODED (quality 0.95)
    val (_, meanSrc) = stats((x, y, ch) => (src.getRGB(x, y) >> ((2 - ch) * 8)) & 0xff)
    assert(meanSrc <= 3.0, f"mean per-sample diff $meanSrc%.3f vs pre-encode source")
  }

  test("pixelStats integrates jpeg payloads end to end") {
    val spark2 = spark
    import spark2.implicits._
    val gray = SOI ++ dqt(0, flatQ) ++ dcT ++ acT ++
      sof0(8, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      entropy(dcBlock16) ++ EOI
    val media = Seq((7L, gray)).toDF("media_id", "payload")
    val r = Multimodal.pixelStats(media).collect().head
    assert(r.getString(1) === "jpeg")
    assert(r.getInt(2) === 8 && r.getInt(3) === 8 && r.getInt(4) === 1)
    assert(r.getDouble(5) === 144.0) // flat → mean 144 exactly
    assert(r.getInt(6) === 144 && r.getInt(7) === 144)
  }
}

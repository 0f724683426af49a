package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PixelDecodeSpec extends SparkTestBase {

  // ---- hand-built PNG encoder (test-only): real zlib via Deflater, one
  // chosen filter byte per scanline ----

  private def crc32(b: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32(); c.update(b); c.getValue.toInt
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    bb.putInt(crc32(typ.getBytes("US-ASCII") ++ data))
    bb.array()
  }

  /** 8-bit PNG from row-major samples; `filters(r)` picks each scanline's
    * filter type (0-4), exercising the de-filter paths.
    */
  private def png(w: Int, h: Int, channels: Int, samples: Array[Int],
      filters: Int => Int): Array[Byte] = {
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val bpr = w * channels
    // raw scanlines with filter bytes, filtered per RFC 2083 §6
    val raw = new Array[Byte](h * (bpr + 1))
    for (r <- 0 until h) {
      val f = filters(r)
      raw(r * (bpr + 1)) = f.toByte
      for (x <- 0 until bpr) {
        val v = samples(r * bpr + x)
        val a = if (x >= channels) samples(r * bpr + x - channels) else 0
        val up = if (r > 0) samples((r - 1) * bpr + x) else 0
        val c = if (r > 0 && x >= channels) samples((r - 1) * bpr + x - channels) else 0
        val filtered = f match {
          case 0 => v
          case 1 => v - a
          case 2 => v - up
          case 3 => v - (a + up) / 2
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            v - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(r * (bpr + 1) + 1 + x) = (filtered & 0xff).toByte
      }
    }
    val deflated = {
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(out)
      d.write(raw); d.close(); out.toByteArray
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++ chunk("IEND", Array.empty)
  }

  test("PNG 1x1 grayscale round-trips through inflate + de-filter") {
    val img = PixelDecode.decode(png(1, 1, 1, Array(137), _ => 0)).get
    assert((img.format, img.width, img.height, img.channels) === (("png", 1, 1, 1)))
    assert(img.samples.toSeq === Seq(137))
  }

  test("PNG truecolor round-trips under every filter type") {
    val samples = Array.tabulate(4 * 3 * 3)(i => (i * 37 + 11) % 256)
    for (f <- 0 to 4) {
      val img = PixelDecode.decode(png(3, 4, 3, samples, _ => f)).get
      assert(img.samples.toSeq === samples.toSeq, s"filter $f")
    }
    // mixed filters per scanline (the realistic encoder output)
    val mixed = PixelDecode.decode(png(3, 4, 3, samples, r => r % 5)).get
    assert(mixed.samples.toSeq === samples.toSeq)
  }

  test("PNG RGBA and gray+alpha channel counts decode") {
    val rgba = Array.tabulate(2 * 2 * 4)(i => (i * 53) % 256)
    val img = PixelDecode.decode(png(2, 2, 4, rgba, _ => 4)).get
    assert(img.channels === 4 && img.samples.toSeq === rgba.toSeq)
    val ga = Array.tabulate(2 * 2 * 2)(i => (i * 91 + 3) % 256)
    val img2 = PixelDecode.decode(png(2, 2, 2, ga, _ => 1)).get
    assert(img2.channels === 2 && img2.samples.toSeq === ga.toSeq)
  }

  test("truncated or corrupt PNG quarantines (None), never throws") {
    val good = png(3, 4, 3, Array.fill(36)(7), _ => 0)
    // cut INSIDE the IDAT chunk (IHDR ends at byte 33, IDAT data starts at
    // 41): the chunk length now points past the array → quarantine
    assert(PixelDecode.decode(good.take(50)).isEmpty)
    val badDeflate = good.clone()
    badDeflate(45) = (badDeflate(45) ^ 0x55).toByte // corrupt zlib payload
    // either inflater error (None via catch) or short output (None) — must not throw
    PixelDecode.decode(badDeflate)
    assert(PixelDecode.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(PixelDecode.decode(null).isEmpty)
  }

  test("BMP decode normalizes bottom-up BGR to top-down RGB") {
    // 2x2, distinct per-pixel colors: image row 0 = [(1,2,3),(4,5,6)],
    // row 1 = [(7,8,9),(10,11,12)] — file stores row 1 FIRST (bottom-up),
    // bytes per pixel B,G,R; stride 8 (2*3 padded to 4)
    val pix = Array[Int](
      9, 8, 7, 12, 11, 10, 0, 0, // file row 0 = image row 1, + 2 pad bytes
      3, 2, 1, 6, 5, 4, 0, 0)    // file row 1 = image row 0
    val header = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put('B'.toByte).put('M'.toByte).putInt(54 + 16).putInt(0).putInt(54)
      .putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0).array()
    val img = PixelDecode.decode(header ++ pix.map(_.toByte)).get
    assert((img.width, img.height, img.channels) === ((2, 2, 3)))
    assert(img.samples.toSeq ===
      Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)) // RGB, top row first
    assert(img.at(0, 0, 0) === 1 && img.at(1, 1, 2) === 12)
  }

  test("synthetic BMP pattern (Column byte math) decodes to the formula") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(5L, 6L, 7L, 8L).toDF("media_id")
      .select(col("media_id"),
        Multimodal.syntheticBmpPattern(col("media_id"),
          (lit(1) + col("media_id") % 5).cast("int"),
          (lit(1) + col("media_id") % 4).cast("int")).as("payload"))
    val rows = Multimodal.pixelStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(5L, 6L, 7L, 8L)) {
      val w = (1 + id % 5).toInt; val h = (1 + id % 4).toInt
      def v(r: Int, c: Int, ch: Int) = ((id * 31 + r * 7 + c * 3 + ch * 11) % 256).toInt
      val all = for { r <- 0 until h; c <- 0 until w } yield v(r, c, 0)
      val row = rows(id)
      assert(row.getString(1) === "bmp")
      assert(row.getInt(2) === w && row.getInt(3) === h)
      assert(row.getDouble(5) === all.map(_.toLong).sum.toDouble / (w * h)) // r_mean
      assert(row.getInt(6) === all.min && row.getInt(7) === all.max)
      assert(row.getInt(14) === v(0, 0, 0))          // top_left_r
      assert(row.getInt(15) === v(h - 1, w - 1, 2))  // bottom_right_b
    }
  }

  test("fuzz: random and magic-prefixed garbage never throws or hangs (quarantine contract)") {
    // decode() walks UNTRUSTED bytes — at corpus scale a poisoned payload
    // must quarantine (None), never crash or loop the scan. Seeded PRNG so
    // a failure reproduces.
    val rnd = new scala.util.Random(74517L)
    val magics = Seq(
      Array[Byte](0x42, 0x4d),                                // BM
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), // PNG
      Array(0xff, 0xd8).map(_.toByte),                        // JPEG SOI
      Array.empty[Byte])
    for (i <- 0 until 400) {
      val body = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(body)
      val payload = magics(i % magics.length) ++ body
      PixelDecode.decode(payload) // must return, None or Some — no throw
    }
    // structured prefixes with corrupted tails: take each valid builder
    // output and flip bytes through the whole container
    val valid = png(3, 4, 3, Array.tabulate(36)(_ % 256), r => r % 5)
    for (pos <- 8 until valid.length by 7) {
      val mut = valid.clone(); mut(pos) = (mut(pos) ^ 0xa5).toByte
      PixelDecode.decode(mut)
    }
  }

  test("zlib FDICT header quarantines instead of spinning the inflate loop") {
    // A preset-dictionary zlib stream (FLG bit 5 set) makes Inflater
    // return 0 with needsDictionary() — neither needsInput() nor
    // finished() — so a loop exiting only on needsInput() spins forever.
    // Build one with a real Deflater+dictionary so the header is valid.
    val dict = "graftdict".getBytes("US-ASCII")
    val d = new java.util.zip.Deflater()
    d.setDictionary(dict)
    d.setInput(Array.fill[Byte](13)(7)) // 1x1 RGB + filter byte won't match, any payload works
    d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf)
    d.end()
    val fdictIdat = buf.take(n)
    assert((fdictIdat(1) & 0x20) != 0, "test stream must set FDICT")
    val payload =
      Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", java.nio.ByteBuffer.allocate(13)
          .putInt(1).putInt(1).put(8.toByte).put(2.toByte)
          .put(0.toByte).put(0.toByte).put(0.toByte).array()) ++
        chunk("IDAT", fdictIdat) ++ chunk("IEND", Array.empty)
    // must return promptly — the spec itself is the hang guard
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val f = done.submit(new java.util.concurrent.Callable[Option[PixelDecode.Image]] {
        def call() = PixelDecode.decode(payload)
      })
      assert(f.get(10, java.util.concurrent.TimeUnit.SECONDS).isEmpty)
    } finally done.shutdownNow()
  }

  test("decode-bomb geometry quarantines before allocating (PNG and JPEG)") {
    // 50-byte streams claiming huge frames: allocation would OOM (an
    // Error, uncatchable by the quarantine) — the geometry cap must
    // return None first, and fast
    val hugePng =
      Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", java.nio.ByteBuffer.allocate(13)
          .putInt(46000).putInt(46000).put(8.toByte).put(2.toByte)
          .put(0.toByte).put(0.toByte).put(0.toByte).array()) ++
        chunk("IDAT", Array[Byte](1, 2, 3)) ++ chunk("IEND", Array.empty)
    assert(PixelDecode.decode(hugePng).isEmpty)
    // minimal JPEG: SOI, DQT, SOF0 claiming 65535x65535, DHT, SOS
    def seg(marker: Int, data: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((data.length + 2) >> 8).toByte, ((data.length + 2) & 0xff).toByte) ++ data
    val dqt = seg(0xdb, Array[Byte](0) ++ Array.fill[Byte](64)(16))
    val sof = seg(0xc0, Array[Byte](8,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, // 65535 x 65535
      1, 1, 0x11, 0))
    val dhtBits = Array.fill[Byte](16)(0); dhtBits(0) = 1
    val dht = seg(0xc4, Array[Byte](0x00) ++ dhtBits ++ Array[Byte](0)) ++
      seg(0xc4, Array[Byte](0x10) ++ dhtBits ++ Array[Byte](0))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val hugeJpeg = Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++ dht ++ sos ++
      Array[Byte](0, 0) ++ Array(0xff.toByte, 0xd9.toByte)
    assert(PixelDecode.decode(hugeJpeg).isEmpty)
  }

  test("pixelStats quarantines undecodable payloads as null stats") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq((1L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val r = Multimodal.pixelStats(media).collect().head
    assert(r.getLong(0) === 1L && r.isNullAt(1) && r.isNullAt(5))
  }

  // ---- palette PNG (color type 3, bit depths 1/2/4/8) ----

  /** Hand-built palette PNG: packed MSB-first indices, filter 0 rows. */
  private def palettePng(w: Int, h: Int, depth: Int, plte: Array[Byte],
      idx: (Int, Int) => Int, includePlte: Boolean = true): Array[Byte] = {
    val bpr = (w * depth + 7) / 8
    val raw = new Array[Byte](h * (bpr + 1))
    for (r <- 0 until h; c <- 0 until w) {
      val bitPos = c * depth
      val off = r * (bpr + 1) + 1 + (bitPos >> 3)
      raw(off) = (raw(off) | (idx(r, c) << (8 - depth - (bitPos & 7)))).toByte
    }
    val deflated = {
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(out)
      d.write(raw); d.close(); out.toByteArray
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++
      (if (includePlte) chunk("PLTE", plte) else Array.empty[Byte]) ++
      chunk("IDAT", deflated) ++ chunk("IEND", Array.empty[Byte])
  }

  test("palette PNG: fixture payloads match the JDK ImageIO reader pixel-for-pixel") {
    // the q194 fixture covers all four depths (doc_id % 4) and the
    // None/Sub/Up filter cycle; ImageIO also validates our chunk CRCs.
    // dimension-sized collect: 12 tiny test images
    val payloads = graft.queries.MediaFixtures
      .pngPalette7(spark, "/root/testdata/sf0.001")
      .orderBy(col("media_id")).limit(12).collect()
    assert(payloads.length === 12)
    payloads.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("payload")
      val ours = PixelDecode.decode(bytes)
        .getOrElse(fail(s"quarantined media_id=${row.getLong(0)}"))
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"JDK rejected media_id=${row.getLong(0)}")
      assert(ours.width === jdk.getWidth && ours.height === jdk.getHeight)
      assert(ours.channels === 3)
      for (r <- 0 until ours.height; c <- 0 until ours.width) {
        val argb = jdk.getRGB(c, r)
        assert(ours.at(r, c, 0) === ((argb >> 16) & 0xff) &&
          ours.at(r, c, 1) === ((argb >> 8) & 0xff) &&
          ours.at(r, c, 2) === (argb & 0xff),
          s"pixel ($r,$c) of media_id=${row.getLong(0)}")
      }
    }
  }

  test("palette PNG: sub-byte depths unpack MSB-first") {
    // depth 2, 4 colors; idx(r,c) = c % 4 over a 5-wide row → packed
    // bytes 0b00011011, 0b00......
    val plte = Array.tabulate[Byte](12)(i => (10 * i).toByte)
    val img = PixelDecode.decode(
      palettePng(5, 2, 2, plte, (_, c) => c % 4)).get
    assert(img.channels === 3)
    for (c <- 0 until 5; ch <- 0 until 3)
      assert(img.at(1, c, ch) === ((10 * ((c % 4) * 3 + ch)) & 0xff))
  }

  test("16-bit PNG: fixture payloads match the JDK ImageIO reader sample-for-sample") {
    // q200's truecolor depth-16 payloads: big-endian sample pairs, 6-byte
    // filter stride, None/Sub/Up cycle. getRGB would truncate to 8 bits —
    // read the JDK's raster at full precision instead.
    // dimension-sized collect: 12 tiny test images
    val payloads = graft.queries.MediaFixtures
      .png16_23(spark, "/root/testdata/sf0.001")
      .orderBy(col("media_id")).limit(12).collect()
    assert(payloads.length === 12)
    payloads.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("payload")
      val ours = PixelDecode.decode(bytes)
        .getOrElse(fail(s"quarantined media_id=${row.getLong(0)}"))
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"JDK rejected media_id=${row.getLong(0)}")
      assert(ours.width === jdk.getWidth && ours.height === jdk.getHeight)
      assert(ours.channels === 3)
      val raster = jdk.getRaster
      for (r <- 0 until ours.height; c <- 0 until ours.width; ch <- 0 until 3)
        assert(ours.at(r, c, ch) === raster.getSample(c, r, ch),
          s"sample ($r,$c,$ch) of media_id=${row.getLong(0)}")
      // at least one sample must exceed 255 or the depth test is vacuous
      assert(ours.samples.exists(_ > 255))
    }
  }

  // ---- Adam7 interlace ----

  /** Hand-built Adam7 grayscale PNG (color type 0, depth 8, filter 0):
    * the seven passes' rows emitted in spec order, each an independent
    * sub-image. Exercises the non-palette scatter path.
    */
  private def adam7GrayPng(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val passes = Seq((0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
      (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1))
    val raw = new java.io.ByteArrayOutputStream()
    for ((rs, cs, rStr, cStr) <- passes; if rs < h && cs < w)
      for (fr <- rs until h by rStr) {
        raw.write(0) // filter None
        for (fc <- cs until w by cStr) raw.write(px(fr, fc) & 0xff)
      }
    val deflated = {
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(out)
      d.write(raw.toByteArray); d.close(); out.toByteArray
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(1.toByte).array()
    Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++
      chunk("IDAT", deflated) ++ chunk("IEND", Array.empty[Byte])
  }

  test("Adam7 gray: every pixel lands at its frame position") {
    // 9×10 (odd dims force ragged pass geometry: ceil divisions live)
    val img = PixelDecode.decode(adam7GrayPng(9, 10, (r, c) => r * 16 + c)).get
    assert(img.width === 9 && img.height === 10 && img.channels === 1)
    for (r <- 0 until 10; c <- 0 until 9)
      assert(img.at(r, c, 0) === r * 16 + c, s"pixel ($r,$c)")
  }

  test("Adam7 palette fixture payloads match the JDK ImageIO reader pixel-for-pixel") {
    // same formulas as the q194 fixture, Adam7-packed sub-byte scanlines —
    // ImageIO independently de-interlaces. dimension-sized collect: 8 tiny
    // test images
    val payloads = graft.queries.MediaFixtures
      .pngAdam7_11(spark, "/root/testdata/sf0.001")
      .orderBy(col("media_id")).limit(8).collect()
    assert(payloads.nonEmpty)
    payloads.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("payload")
      val ours = PixelDecode.decode(bytes)
        .getOrElse(fail(s"quarantined media_id=${row.getLong(0)}"))
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"JDK rejected media_id=${row.getLong(0)}")
      assert(ours.width === jdk.getWidth && ours.height === jdk.getHeight)
      for (r <- 0 until ours.height; c <- 0 until ours.width) {
        val argb = jdk.getRGB(c, r)
        assert(ours.at(r, c, 0) === ((argb >> 16) & 0xff) &&
          ours.at(r, c, 1) === ((argb >> 8) & 0xff) &&
          ours.at(r, c, 2) === (argb & 0xff),
          s"pixel ($r,$c) of media_id=${row.getLong(0)}")
      }
    }
  }

  test("Adam7 truncated stream quarantines") {
    val ok = adam7GrayPng(9, 10, (r, c) => r + c)
    // rebuild with the IDAT payload cut short: inflated size misses the
    // per-pass expected total -> None
    val sig = ok.take(8)
    val ihdrChunk = ok.slice(8, 8 + 12 + 13)
    val idatLen = java.nio.ByteBuffer.wrap(ok, 33, 4).getInt
    val idatData = ok.slice(41, 41 + idatLen)
    // cut half the deflated stream — dropping only the last 4 bytes would
    // remove just the zlib Adler-32 trailer, which the decoder (correctly)
    // does not require once every expected pass byte has been produced
    val short = idatData.take(idatData.length / 2)
    val bad = sig ++ ihdrChunk ++ chunk("IDAT", short) ++
      chunk("IEND", Array.empty[Byte])
    assert(PixelDecode.decode(bad).isEmpty)
  }

  // ---- BI_RLE8 BMP ----

  /** Hand-built RLE8 BMP from explicit opcode bytes (palette = 4 gray
    * levels), so each escape is placed deliberately. */
  private def rle8Bmp(w: Int, h: Int, ops: Array[Int],
      nColors: Int = 4): Array[Byte] = {
    val offBits = 14 + 40 + 4 * nColors
    val bb = java.nio.ByteBuffer.allocate(offBits + ops.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(offBits + ops.length).putInt(0).putInt(offBits)
    bb.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(8.toShort)
      .putInt(1).putInt(ops.length).putInt(0).putInt(0)
      .putInt(nColors).putInt(0)
    for (k <- 0 until nColors) // palette: B,G,R = 10k+2, 10k+1, 10k
      bb.put((10 * k + 2).toByte).put((10 * k + 1).toByte)
        .put((10 * k).toByte).put(0.toByte)
    ops.foreach(o => bb.put(o.toByte))
    bb.array()
  }

  test("RLE8 BMP: runs, absolute segments, delta skip, EOL/EOF, bottom-up flip") {
    // 6×2, file rows bottom-up: file row 0 (= logical BOTTOM row 1):
    // run 3×idx1, absolute [2,3,0] (odd → pad byte), EOL;
    // file row 1 (= logical TOP row 0): run 2×idx2, delta skip (2,0)
    // (skipped cells stay idx 0), run 2×idx3, EOL, EOF
    val img = PixelDecode.decode(rle8Bmp(6, 2, Array(
      3, 1, 0, 3, 2, 3, 0, 0, 0, 0, // bottom row: 1 1 1 2 3 0
      2, 2, 0, 2, 2, 0, 2, 3, 0, 0, // top row: 2 2 [0 0] 3 3
      0, 1))).get
    assert(img.width === 6 && img.height === 2 && img.channels === 3)
    val top = Seq(2, 2, 0, 0, 3, 3)
    val bottom = Seq(1, 1, 1, 2, 3, 0)
    for (c <- 0 until 6) {
      // palette k decodes to R,G,B = 10k, 10k+1, 10k+2
      assert(img.at(0, c, 0) === 10 * top(c) &&
        img.at(0, c, 2) === 10 * top(c) + 2, s"top col $c")
      assert(img.at(1, c, 1) === 10 * bottom(c) + 1, s"bottom col $c")
    }
  }

  test("RLE8 BMP quarantines: run past row end, index past palette, truncation, top-down") {
    assert(PixelDecode.decode(rle8Bmp(4, 1,
      Array(5, 1, 0, 0, 0, 1))).isEmpty, "run of 5 in a 4-wide row")
    assert(PixelDecode.decode(rle8Bmp(4, 1,
      Array(2, 9, 0, 0, 0, 1))).isEmpty, "index 9 past a 4-color palette")
    assert(PixelDecode.decode(rle8Bmp(4, 1,
      Array(2, 1))).isEmpty, "stream ends without EOF")
    val neg = rle8Bmp(4, 1, Array(4, 1, 0, 0, 0, 1))
    val bb = java.nio.ByteBuffer.wrap(neg)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -1) // negative height: RLE is bottom-up only
    assert(PixelDecode.decode(neg).isEmpty, "top-down RLE is malformed")
  }

  /** [[rle8Bmp]]'s 4-bit sibling: bitCount 4, compression BI_RLE4. */
  private def rle4Bmp(w: Int, h: Int, ops: Array[Int]): Array[Byte] = {
    val b = rle8Bmp(w, h, ops)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(28, 4.toShort) // biBitCount
    bb.putInt(30, 2)           // BI_RLE4
    b
  }

  test("RLE4 BMP: runs alternate nibbles; absolute segments nibble-pack MSB-first") {
    // 6×1: encoded run of 3 with opcode value 0x12 alternates its
    // nibbles → 1 2 1; absolute segment of 3 nibbles [3,0,2] packs
    // MSB-first as 0x30 0x20 (2 bytes, even — no pad) → 3 0 2
    val img = PixelDecode.decode(rle4Bmp(6, 1, Array(
      3, 0x12, 0, 3, 0x30, 0x20, 0, 0, 0, 1))).get
    assert(img.width === 6 && img.height === 1)
    val expect = Seq(1, 2, 1, 3, 0, 2)
    for (c <- 0 until 6)
      assert(img.at(0, c, 0) === 10 * expect(c), s"col $c")
  }

  test("RLE8 BMP fixture payloads match the JDK ImageIO reader pixel-for-pixel") {
    // dimension-sized collect: 8 tiny test images
    val payloads = graft.queries.MediaFixtures
      .bmpRle8_13(spark, "/root/testdata/sf0.001")
      .orderBy(col("media_id")).limit(8).collect()
    assert(payloads.nonEmpty)
    payloads.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("payload")
      val ours = PixelDecode.decode(bytes)
        .getOrElse(fail(s"quarantined media_id=${row.getLong(0)}"))
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"JDK rejected media_id=${row.getLong(0)}")
      assert(ours.width === jdk.getWidth && ours.height === jdk.getHeight)
      for (r <- 0 until ours.height; c <- 0 until ours.width) {
        val argb = jdk.getRGB(c, r)
        assert(ours.at(r, c, 0) === ((argb >> 16) & 0xff) &&
          ours.at(r, c, 1) === ((argb >> 8) & 0xff) &&
          ours.at(r, c, 2) === (argb & 0xff),
          s"pixel ($r,$c) of media_id=${row.getLong(0)}")
      }
    }
  }

  test("RLE4 BMP fixture payloads match the JDK ImageIO reader pixel-for-pixel") {
    // dimension-sized collect: 6 tiny test images
    val payloads = graft.queries.MediaFixtures
      .bmpRle4_17(spark, "/root/testdata/sf0.001")
      .orderBy(col("media_id")).limit(6).collect()
    assert(payloads.nonEmpty)
    payloads.foreach { row =>
      val bytes = row.getAs[Array[Byte]]("payload")
      val ours = PixelDecode.decode(bytes)
        .getOrElse(fail(s"quarantined media_id=${row.getLong(0)}"))
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"JDK rejected media_id=${row.getLong(0)}")
      assert(ours.width === jdk.getWidth && ours.height === jdk.getHeight)
      for (r <- 0 until ours.height; c <- 0 until ours.width) {
        val argb = jdk.getRGB(c, r)
        assert(ours.at(r, c, 0) === ((argb >> 16) & 0xff) &&
          ours.at(r, c, 1) === ((argb >> 8) & 0xff) &&
          ours.at(r, c, 2) === (argb & 0xff),
          s"pixel ($r,$c) of media_id=${row.getLong(0)}")
      }
    }
  }

  test("palette PNG quarantines: missing PLTE, out-of-range index, bad depth") {
    val plte2 = Array[Byte](1, 2, 3, 4, 5, 6) // 2 entries
    assert(PixelDecode.decode(
      palettePng(4, 4, 8, plte2, (_, _) => 0, includePlte = false)).isEmpty,
      "palette image without PLTE must quarantine")
    assert(PixelDecode.decode(
      palettePng(4, 4, 8, plte2, (_, _) => 5)).isEmpty,
      "index past the palette must quarantine")
    assert(PixelDecode.decode(
      palettePng(4, 4, 3, plte2, (_, _) => 0)).isEmpty,
      "bit depth 3 is not a PNG depth")
  }
}

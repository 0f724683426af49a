package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WavDecodeSpec extends SparkTestBase {

  // ---- hand-built WAV encoder (test-only, JVM-side): independent of the
  // Column-math builder so the two implementations cross-check ----
  private def wav(sampleRate: Int, channels: Int, samples: Array[Int],
      bits: Int = 16, fmtCode: Int = 1): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(data)
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def tag(s: String): Unit = o.write(s.getBytes("US-ASCII"))
    val dataLen = samples.length * 2
    tag("RIFF"); le32(36 + dataLen); tag("WAVE")
    tag("fmt "); le32(16); le16(fmtCode); le16(channels); le32(sampleRate)
    le32(sampleRate * channels * 2); le16(channels * 2); le16(bits)
    tag("data"); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    data.toByteArray
  }

  test("16-bit PCM round-trips: mono and stereo, negative samples sign-extend") {
    val mono = Array(0, 1, -1, 32767, -32768, 1000, -1000)
    val c1 = WavDecode.decode(wav(8000, 1, mono)).get
    assert(c1.sampleRate === 8000 && c1.channels === 1)
    assert(c1.samples.toSeq === mono.toSeq)
    val stereo = Array(10, -10, 20, -20, 30, -30) // L R L R L R
    val c2 = WavDecode.decode(wav(44100, 2, stereo)).get
    assert(c2.nFrames === 3 && c2.at(1, 0) === 20 && c2.at(2, 1) === -30)
  }

  test("non-PCM, non-16-bit, and malformed containers quarantine (None)") {
    val s = Array(1, 2, 3, 4)
    assert(WavDecode.decode(wav(8000, 1, s, fmtCode = 3)).isEmpty)  // float PCM
    assert(WavDecode.decode(wav(8000, 1, s, bits = 8)).isEmpty)     // 8-bit
    assert(WavDecode.decode(null).isEmpty)
    assert(WavDecode.decode(Array[Byte](1, 2, 3)).isEmpty)
    // data chunk before fmt: cannot interpret samples
    val good = wav(8000, 1, s)
    assert(WavDecode.decode("RIFF".getBytes ++ good.slice(4, 8) ++
      "WAVE".getBytes ++ good.slice(36, 36 + 8 + 8)).isEmpty)
  }

  test("truncated data yields only the complete frames present — header cannot drive allocation") {
    val stereo = Array(1, -1, 2, -2, 3, -3)
    val full = wav(8000, 2, stereo)
    // cut mid-way through the data chunk: declared size exceeds bytes
    // (12 data bytes − 2 = 10 → 5 samples → 2 whole stereo frames)
    val cut = full.take(full.length - 2)
    val c = WavDecode.decode(cut).get
    assert(c.nFrames === 2) // 3rd frame incomplete → dropped
    assert(c.at(1, 1) === -2)
    // decode-bomb: 44-byte header claiming a ~1 GB data chunk must return
    // near-instantly with zero samples, not allocate from the claim
    val bomb = full.take(44).clone()
    bomb(40) = 0; bomb(41) = 0; bomb(42) = 0; bomb(43) = 0x3f // size = 0x3f000000
    val cb = WavDecode.decode(bomb)
    assert(cb.isEmpty || cb.get.samples.isEmpty)
  }

  test("fuzz: random and RIFF-prefixed garbage never throws or hangs") {
    val rnd = new scala.util.Random(91731L)
    val prefixes = Seq("RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "WAVE".getBytes,
      "RIFF".getBytes, Array.empty[Byte])
    for (i <- 0 until 300) {
      val body = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(body)
      WavDecode.decode(prefixes(i % prefixes.length) ++ body) // no throw
    }
    val valid = wav(8000, 2, Array.tabulate(20)(i => i * 1000 - 10000))
    for (pos <- 0 until valid.length by 3) {
      val mut = valid.clone(); mut(pos) = (mut(pos) ^ 0x5a).toByte
      WavDecode.decode(mut)
    }
  }

  test("Column-math syntheticWavPattern decodes to the formula (builder ≡ decoder cross-check)") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(3L, 4L, 5L).toDF("media_id").select(col("media_id"),
      Multimodal.syntheticWavPattern(col("media_id"), lit(10)).as("payload"))
    val rows = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    for ((id, bytes) <- rows) {
      val clip = WavDecode.decode(bytes).get
      assert(clip.sampleRate === 8000 && clip.channels === 1)
      val expect = (0 until 10).map(i => ((id * 37 + i * 13) % 2048).toInt - 1024)
      assert(clip.samples.toSeq === expect, s"id $id")
    }
  }

  test("audioFeatures: frames, partial tail, RMS/peak/zero-crossings vs a direct model") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq(7L).toDF("media_id").select(col("media_id"),
      Multimodal.syntheticWavPattern(col("media_id"), lit(100)).as("payload"))
    val got = Multimodal.audioFeatures(media, frameSize = 64).collect()
      .map(r => r.getInt(1) -> (r.getInt(2), r.getDouble(3), r.getInt(4), r.getInt(5))).toMap
    val s = (0 until 100).map(i => ((7L * 37 + i * 13) % 2048).toInt - 1024)
    def model(lo: Int, hi: Int) = {
      val f = s.slice(lo, hi)
      (f.length,
        math.sqrt(f.map(x => x.toDouble * x).sum / f.length),
        f.map(math.abs).max,
        f.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    }
    assert(got(0) === model(0, 64))
    assert(got(1) === model(64, 100)) // partial tail: 36 samples
    assert(got.size === 2)
  }

  test("undecodable audio payloads quarantine to zero rows") {
    val spark2 = spark
    import spark2.implicits._
    val media = Seq((1L, "not audio".getBytes("UTF-8")), (2L, null))
      .toDF("media_id", "payload")
    assert(Multimodal.audioFeatures(media, 64).count() === 0)
  }

  test("resizeNearest maps output pixels to floor-scaled source coordinates") {
    // 4x2 image, values v(r,c,ch) = r*100 + c*10 + ch
    val img = PixelDecode.Image("bmp", 4, 2, 3,
      (for { r <- 0 until 2; c <- 0 until 4; ch <- 0 until 3 }
        yield r * 100 + c * 10 + ch).toArray)
    val small = Multimodal.resizeNearest(img, 2, 1)
    // out (0,0) ← src (0*2/1=0, 0*4/2=0); out (0,1) ← src (0, 1*4/2=2)
    assert(small.at(0, 0, 0) === 0 && small.at(0, 1, 0) === 20)
    assert(small.at(0, 1, 2) === 22)
    // upscale: out 4x2 ← 2x1 grid duplicates source pixels
    val up = Multimodal.resizeNearest(small, 4, 2)
    assert((0 until 4).map(c => up.at(1, c, 0)) === Seq(0, 0, 20, 20))
  }
}

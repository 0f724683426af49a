package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Lossless JPEG (SOF3): the contract is EXACTNESS — decode(encode(x))
  * must equal x bit for bit, for arbitrary content (noise, not just
  * smooth gradients), under every annex-H predictor.
  */
class JpegLosslessSpec extends AnyFunSuite {

  test("bit-exact round-trip on random noise under every predictor") {
    val rnd = new scala.util.Random(13L)
    for (pred <- 1 to 7) {
      val (w, h) = (23, 17) // deliberately not multiples of 8
      val img = Array.fill(h, w, 3)(rnd.nextInt(256))
      def px(y: Int, x: Int, ch: Int): Int = img(y)(x)(ch)
      val bytes = JpegLosslessEncode.encode(w, h, 3, px, predictor = pred)
      val dec = JpegDecode.decode(bytes)
        .getOrElse(fail(s"lossless decode failed, predictor $pred"))
      assert(dec.width === w && dec.height === h && dec.channels === 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert(dec.at(y, x, c) === px(y, x, c),
          s"predictor $pred: mismatch at ($y,$x,$c)")
    }
  }

  test("12-bit grayscale noise round-trips exactly") {
    val rnd = new scala.util.Random(29L)
    val (w, h) = (31, 9)
    val img = Array.fill(h, w)(rnd.nextInt(4096))
    val bytes = JpegLosslessEncode.encode(w, h, 1,
      (y, x, _) => img(y)(x), predictor = 4, precision = 12)
    val dec = JpegDecode.decode(bytes).getOrElse(fail("12-bit lossless failed"))
    assert(dec.channels === 1)
    var big = false
    for (y <- 0 until h; x <- 0 until w) {
      assert(dec.at(y, x, 0) === img(y)(x))
      if (img(y)(x) > 255) big = true
    }
    assert(big, "the fixture should exercise values beyond 8-bit")
  }

  test("point transform is near-lossless by exactly the dropped bits") {
    val rnd = new scala.util.Random(7L)
    val (w, h) = (16, 16)
    val img = Array.fill(h, w)(rnd.nextInt(256))
    val bytes = JpegLosslessEncode.encode(w, h, 1,
      (y, x, _) => img(y)(x), predictor = 1, pt = 1)
    val dec = JpegDecode.decode(bytes).getOrElse(fail("pt decode failed"))
    for (y <- 0 until h; x <- 0 until w)
      assert(dec.at(y, x, 0) === (img(y)(x) >> 1) << 1)
  }

  test("arithmetic lossless (SOF11) and subsampled lossless stay quarantined") {
    val bytes = JpegLosslessEncode.encode(8, 8, 1, (y, x, _) => y * 8 + x)
    val idx = bytes.indexOfSlice(Array(0xff.toByte, 0xc3.toByte))
    assert(idx >= 0)
    val arith = bytes.clone()
    arith(idx + 1) = 0xcb.toByte // SOF11
    assert(JpegDecode.decode(arith).isEmpty)
    // truncated entropy data must quarantine, never throw
    JpegDecode.decode(bytes.take(bytes.length / 2))
  }
}

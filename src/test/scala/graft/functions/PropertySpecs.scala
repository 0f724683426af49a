package graft.functions

import graft.SparkTestBase
import graft.text.Chunker
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests for the pure kernels (SURVEY §5 plan): safe-arith
  * null semantics, chunker invariants, TTM window algebra. Uses ScalaCheck
  * generators with deterministic seeds (no scalatestplus bridge in the
  * offline cache).
  */
class PropertySpecs extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("safe arithmetic matches the reference null model on random inputs") {
    val gen = Gen.listOfN(300,
      Gen.zip(Gen.option(Gen.chooseNum(-1e6, 1e6)), Gen.option(Gen.chooseNum(-1e6, 1e6))))
    val pairs = sample(gen, 42L) :+ ((Some(1.0), Some(0.0)): (Option[Double], Option[Double]))
    val df = pairs.map { case (a, b) =>
      (a.map(Double.box).orNull, b.map(Double.box).orNull)
    }.toDF("a", "b")
    val got = df.select(
      SafeArith.safeDivide($"a", $"b").as("d"),
      SafeArith.safeAdd($"a", $"b").as("s"),
      SafeArith.safeMultiply($"a", $"b").as("m"))
      .collect()
    pairs.zip(got).foreach { case ((a, b), row) =>
      // reference model (derived/metrics.py:93-106)
      val expDiv = for { x <- a; y <- b if y != 0 } yield x / y
      val expAdd = for { x <- a; y <- b } yield x + y
      val expMul = for { x <- a; y <- b } yield x * y
      def cell(i: Int) = if (row.isNullAt(i)) None else Some(row.getDouble(i))
      assert(cell(0) === expDiv)
      assert(cell(1) === expAdd)
      assert(cell(2) === expMul)
    }
  }

  test("chunker invariants: bounded chunks, prefix preservation, termination") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta report", "x")
    val caseGen = for {
      n <- Gen.chooseNum(0, 120)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.oneOf(" ", ". ")
      chunkSize <- Gen.chooseNum(40, 200)
      overlap <- Gen.chooseNum(0, 30)
    } yield (ws.mkString(sep), chunkSize, overlap)
    (1L to 60L).foreach { seed =>
      val (text, chunkSize, overlap) = sample(caseGen, seed)
      val chunks = Chunker.chunkText(text, chunkSize, overlap)
      if (text.isEmpty) assert(chunks.isEmpty)
      else {
        assert(chunks.nonEmpty, s"seed=$seed")
        // no chunk exceeds the target size (snapping only shrinks)
        assert(chunks.forall(_.length <= chunkSize), s"seed=$seed")
        // first chunk is a prefix of the trimmed text
        assert(text.trim.startsWith(chunks.head.take(10)), s"seed=$seed")
        // every chunk's content appears in the source
        assert(chunks.forall(c => text.contains(c)), s"seed=$seed")
      }
    }
  }

  test("portableTokenHash: 32-bit range and md5-derivation on random strings") {
    val word = Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr).suchThat(_.nonEmpty)
    val words = sample(Gen.listOfN(200, word), 7L).distinct
    val got = words.toDF("w")
      .select(graft.text.TextFunctions.portableTokenHash($"w").as("h"))
      .as[Long].collect()
    assert(got.forall(h => h >= 0L && h < (1L << 32)))
    // model: little-endian int of the first 4 md5 bytes (the oracle bridge)
    words.zip(got).foreach { case (w, h) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val exp = ((d(3) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
        ((d(1) & 0xffL) << 8) | (d(0) & 0xffL)
      assert(h === exp, s"word=$w")
    }
  }

  test("TTM rolling sum matches a sliding-window model on random series") {
    (1L to 10L).foreach { seed =>
      val vs = sample(Gen.listOfN(12, Gen.chooseNum(-1000.0, 1000.0)), seed)
      val rows = vs.zipWithIndex.map { case (v, i) =>
        val q = i % 4 + 1
        val y = 2020 + i / 4
        ("SYM", java.sql.Date.valueOf(f"$y-${q * 3}%02d-28"), f"acc$i%02d", "10-Q",
          "rev", v, java.sql.Date.valueOf(f"$y-${q * 3 - 2}%02d-01"),
          java.sql.Date.valueOf(f"$y-${q * 3}%02d-28"), s"CY${y}Q$q")
      }.toDF("symbol", "as_of_date", "accn", "form", "concept", "value",
        "start", "end", "frame")
      val got = graft.fundamental.Ttm.compute(rows)
        .orderBy("as_of_date").select("value").as[Double].collect()
      val exp = vs.sliding(4).map(_.sum).toSeq
      assert(got.length === exp.length, s"seed=$seed")
      got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9, s"seed=$seed") }
    }
  }
}

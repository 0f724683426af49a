package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Portable HLL: register determinism, merge ≡ whole-build, error bounds. */
class HllSpec extends SparkTestBase {
  import spark.implicits._

  private def est(registers: Array[Int]): Double = {
    val s = registers.map(r => math.pow(2, 55 - r).toLong).sum
    val raw = 0.709 * 64 * 64 * math.pow(2, 55) / s
    val v = registers.count(_ == 0)
    if (raw <= 160 && v > 0) 64.0 * math.log(64.0 / v) else raw
  }

  test("registers match an independent JVM md5 replay") {
    val df = Seq(7L, 42L, 9999L).toDF("v")
    val got = Hll.build(df, Seq.empty, "v").select("registers")
      .as[Array[Int]].head()
    val exp = Array.fill(64)(0)
    Seq(7L, 42L, 9999L).foreach { x =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val hv = java.lang.Long.parseLong(hex, 16)
      val j = (hv % 64).toInt
      val w = hv >> 6
      val rho = if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      exp(j) = math.max(exp(j), rho)
    }
    assert(got.toSeq === exp.toSeq)
  }

  test("estimate within ~3 sigma (1.04/sqrt(64) ~ 13%) of 5000 distinct") {
    val df = spark.range(0, 5000).select(col("id").as("v"))
    val e = Hll.build(df, Seq.empty, "v")
      .select(Hll.estimateMicro(col("registers"))).as[Long].head() / 1e6
    assert(math.abs(e - 5000) / 5000 < 0.4, s"estimate $e")
  }

  test("duplicates don't move the sketch; merge == whole-build") {
    val whole = spark.range(0, 6000).select(col("id").as("v"))
    val s1 = Hll.build(spark.range(0, 3000).select(col("id").as("v")), Seq.empty, "v")
      .select(col("registers").as("r1"))
    val s2 = Hll.build(spark.range(2000, 6000).select(col("id").as("v")), Seq.empty, "v")
      .select(col("registers").as("r2"))
    val merged = s1.crossJoin(s2) // 1 row x 1 row
      .select(Hll.merge(col("r1"), col("r2")).as("registers"))
      .as[Array[Int]].head()
    val built = Hll.build(whole, Seq.empty, "v").select("registers")
      .as[Array[Int]].head()
    assert(merged.toSeq === built.toSeq)
    // duplicated input (overlap 2000..3000 counted twice) changed nothing
    val dup = Hll.build(whole.union(whole), Seq.empty, "v")
      .select("registers").as[Array[Int]].head()
    assert(dup.toSeq === built.toSeq)
  }

  test("linear-counting branch fires at tiny cardinality and is close") {
    val df = spark.range(0, 20).select(col("id").as("v"))
    val regs = Hll.build(df, Seq.empty, "v").select("registers")
      .as[Array[Int]].head()
    val raw = 0.709 * 64 * 64 * math.pow(2, 55) /
      regs.map(r => math.pow(2, 55 - r).toLong).sum
    assert(raw <= 160 && regs.count(_ == 0) > 0) // the branch really fires
    val e = Hll.build(df, Seq.empty, "v")
      .select(Hll.estimateMicro(col("registers"))).as[Long].head() / 1e6
    assert(math.abs(est(regs) - e) < 1e-6) // spark == scala replay
    assert(math.abs(e - 20) / 20 < 0.5, s"estimate $e")
  }

  test("pairwiseSetEstimates: identical groups intersect fully, disjoint near zero") {
    val a = spark.range(0, 3000).select(lit("a").as("g"), col("id").as("v"))
    val b = spark.range(0, 3000).select(lit("b").as("g"), col("id").as("v"))
    val c = spark.range(100000, 103000).select(lit("c").as("g"), col("id").as("v"))
    val sk = Hll.build(a.union(b).union(c), Seq("g"), "v")
    val got = Hll.pairwiseSetEstimates(sk, "g")
      .select("ga", "gb", "est_a_micro", "est_b_micro", "est_union_micro",
        "est_intersect_micro")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // a == b exactly: union estimate equals each single estimate, so the
    // inclusion–exclusion intersection equals the single-set estimate
    val (ea, eb, eu, ei) = got(("a", "b"))
    assert(ea === eb && eu === ea && ei === ea)
    // a vs c disjoint: intersection estimate within sketch error of zero
    val (ea2, _, _, ei2) = got(("a", "c"))
    assert(ei2.toDouble / ea2 < 0.35, s"disjoint intersect $ei2 vs $ea2")
  }
}

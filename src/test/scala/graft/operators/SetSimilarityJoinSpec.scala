package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Prefix-filtered exact Jaccard join: parity with the full all-pairs
  * join (the filter must lose NOTHING), clone detection, threshold
  * boundary behavior.
  */
class SetSimilarityJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("exact clones come back at jaccard 1.0; unrelated pairs don't") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // clone of 1
      (3L, "one two three four five six seven")).toDF("id", "text")
    val got = SetSimilarityJoin.selfJoin(docs, "text", "id", 800000L)
      .select("id_a", "id_b", "jaccard_micro")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L, 1000000L)))
  }

  test("pairs right at the threshold stay; just below fall") {
    // 4-token docs → 2 trigram shingles each; sharing 1 of 3 distinct
    // shingles = J(1/3) < 0.5; identical = 1.0
    val docs = Seq(
      (1L, "a b c d"),     // shingles: "a b c", "b c d"
      (2L, "a b c e"),     // shingles: "a b c", "b c e" → J = 1/3
      (3L, "a b c d")).toDF("id", "text")
    val half = SetSimilarityJoin.selfJoin(docs, "text", "id", 333333L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(half === Set((1L, 2L), (1L, 3L), (2L, 3L))) // 1/3 ≥ 0.333333
    val strict = SetSimilarityJoin.selfJoin(docs, "text", "id", 340000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(strict === Set((1L, 3L))) // only the clone pair
  }

  test("prefix filter loses nothing: parity with allPairsJaccard") {
    val rnd = new scala.util.Random(19)
    val vocab = ('a' to 'z').map(_.toString)
    val bases = (1 to 30).map(_ => Seq.fill(12)(vocab(rnd.nextInt(vocab.size))))
    // 31..60 are 2-token mutations of 1..30 → plenty of J ≥ 0.4 pairs
    val docs = (bases.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) } ++
      bases.zipWithIndex.map { case (t, i) =>
        val mut = t.updated(3, vocab(rnd.nextInt(vocab.size)))
          .updated(8, vocab(rnd.nextInt(vocab.size)))
        ((i + 31).toLong, mut)
      }).map { case (id, t) => (id, t.mkString(" ")) }.toDF("id", "text")
    val thr = 0.4
    val exp = Dedup.allPairsJaccard(docs, "text", "id", thr)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = SetSimilarityJoin.selfJoin(docs, "text", "id", 400000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === exp)
    assert(exp.nonEmpty, "fixture should produce at least one pair")
  }

  test("integer threshold test is exact, not float-rounded") {
    // J = 2/3: shared=2, union=3 → 2*1e6 >= thr*3 exactly at thr=666666;
    // thr=666667 must reject (2/3 < 0.666667)
    val docs = Seq(
      (1L, "a b c d e"), // shingles: abc, bcd, cde
      (2L, "a b c d x")) // shingles: abc, bcd, cdx → shared 2, union 4... J=1/2
      .toDF("id", "text")
    val loose = SetSimilarityJoin.selfJoin(docs, "text", "id", 500000L)
      .select("shared", "n_a", "n_b").as[(Long, Long, Long)].collect()
    assert(loose.toSeq === Seq((2L, 3L, 3L))) // J = 2/4 = 0.5 exactly kept
    val tight = SetSimilarityJoin.selfJoin(docs, "text", "id", 500001L)
      .count()
    assert(tight === 0L)
  }
}

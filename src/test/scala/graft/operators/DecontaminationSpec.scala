package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Index-once / probe-many decontamination: channel correctness plus the
  * probe-cost contract (probes read the stored index, never the eval
  * corpus).
  */
class DecontaminationSpec extends SparkTestBase {
  import spark.implicits._

  private val root = "/tmp/graft_decontam_spec"

  private def evalDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight"),
    (101L, "pack my box with five dozen liquor jugs right now")).toDF("id", "text")
  private def evalEmb = Seq(
    (100L, Array(1f, 0f, 0f, 0f)),
    (101L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
  private def cents = Seq(
    (0L, Array(1.0, 0.0, 0.0, 0.0)),
    (1L, Array(0.0, 1.0, 0.0, 0.0))).toDF("cell", "centroid")

  test("both channels flag their plants; clean docs pass") {
    Decontamination.buildIndex(evalDocs, "text", "id", k = 8,
      evalEmb, cents, root)
    val batch = Seq(
      // verbatim n-gram leak of eval 100
      (1L, "prefix words the quick brown fox jumps over the lazy dog tonight"),
      // clean text, semantic clone of eval 101 (scaled vector)
      (2L, "completely unrelated sentence about distributed query engines and lakes"),
      // clean on both channels
      (3L, "another harmless training document with no overlap at all here")).toDF("id", "text")
    val emb = Seq(
      (1L, Array(0f, 0f, 1f, 0f)),
      (2L, Array(0f, 2f, 0f, 0f)), // cosine 1.0 with eval 101
      (3L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val got = Decontamination.probe(spark, batch, "text", "id", k = 8,
        emb, root, tau = 0.9)
      .as[(Long, Long, Int, Long, Int, Int)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 3L, 1, 0L, 0, 1)), s"ngram plant: ${got(0)}")
    assert(got(1)._5 === 1 && got(1)._3 === 0 && got(1)._6 === 1,
      s"semantic plant: ${got(1)}")
    assert(got(2) === ((3L, 0L, 0, 0L, 0, 0)), s"clean doc: ${got(2)}")
  }

  test("probe-cost contract: the probe plan scans ONLY the stored index") {
    Decontamination.buildIndex(evalDocs, "text", "id", k = 8,
      evalEmb, cents, root)
    val batch = Seq((7L, "a short probe document")).toDF("id", "text")
    val emb = Seq((7L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val plan = Decontamination.probe(spark, batch, "text", "id", k = 8,
      emb, root, tau = 0.9).queryExecution.optimizedPlan
    val scanned = plan.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scanned.nonEmpty, "probe must read the persisted index")
    assert(scanned.forall(_.contains("graft_decontam_spec")),
      s"probe read outside the index: $scanned")
  }

  test("second batch probes the same index without a rebuild") {
    Decontamination.buildIndex(evalDocs, "text", "id", k = 8,
      evalEmb, cents, root)
    val b2 = Seq((9L, "pack my box with five dozen liquor jugs right now indeed"))
      .toDF("id", "text")
    val e2 = Seq((9L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val got = Decontamination.probe(spark, b2, "text", "id", k = 8,
        e2, root, tau = 0.9)
      .as[(Long, Long, Int, Long, Int, Int)].collect()
    assert(got.length === 1 && got(0)._3 === 1, s"overlap must flag: ${got.toSeq}")
  }

  test("beyond routeThreshold centroids, assignment routes and still flags the clone") {
    // well-separated geometry (SemDedupSpec discipline): the two LIVE
    // cells are axis-aligned; thousands of decoy centroids cluster near a
    // distant axis so super-level routing cannot confuse them. Exceeding
    // the threshold flips BOTH build and probe onto assignCellsRouted —
    // verdicts must be unchanged from the flat path.
    val rootR = "/tmp/graft_decontam_spec_routed"
    val decoys = (0 until 40).map { i =>
      (100L + i, Array(0.001 * (i % 7), 0.002 * (i % 5), 4.0 + 0.01 * i, 9.0))
    }
    val centsBig = (Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0))) ++ decoys).toDF("cell", "centroid")
    Decontamination.buildIndex(evalDocs, "text", "id", k = 8,
      evalEmb, centsBig, rootR, routeThreshold = 8)
    val batch = Seq(
      (2L, "completely unrelated sentence about distributed query engines and lakes"),
      (3L, "another harmless training document with no overlap at all here")).toDF("id", "text")
    val emb = Seq(
      (2L, Array(0f, 2f, 0f, 0f)), // cosine 1.0 with eval 101
      (3L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val got = Decontamination.probe(spark, batch, "text", "id", k = 8,
        emb, rootR, tau = 0.9, routeThreshold = 8)
      .as[(Long, Long, Int, Long, Int, Int)].collect().sortBy(_._1)
    assert(got(0)._5 === 1 && got(0)._6 === 1, s"routed semantic plant: ${got(0)}")
    assert(got(1)._6 === 0, s"routed clean doc: ${got(1)}")
  }
}

package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Merge-on-read semantics: anti-join application, overlap idempotence,
  * compact ≡ merge-on-read, and delete-file lifecycle.
  */
class DeleteVectorsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val root = s"/tmp/graft_dvspec_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    root
  }

  private def base = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")

  test("no deletes: readMerged is the base, byte for byte") {
    val root = freshRoot("plain")
    DeleteVectors.writeBase(base, root, "t")
    val got = DeleteVectors.readMerged(spark, root, "t", Seq("k"))
    assert(got.count() === 100)
    assert(got.agg(sum("k")).as[Long].head() === 5050L)
  }

  test("overlapping delete batches apply idempotently") {
    val root = freshRoot("overlap")
    DeleteVectors.writeBase(base, root, "t")
    DeleteVectors.appendDeletes(Seq(3L, 7L, 9L).toDF("k"), root, "t")
    DeleteVectors.appendDeletes(Seq(7L, 9L, 11L).toDF("k"), root, "t")
    val got = DeleteVectors.readMerged(spark, root, "t", Seq("k"))
      .select("k").as[Long].collect().toSet
    assert(got.size === 96)
    assert(Seq(3L, 7L, 9L, 11L).forall(!got.contains(_)))
    assert(got.contains(1L) && got.contains(100L))
  }

  test("deleting a key absent from the base is a no-op") {
    val root = freshRoot("absent")
    DeleteVectors.writeBase(base, root, "t")
    DeleteVectors.appendDeletes(Seq(999L, 5L).toDF("k"), root, "t")
    assert(DeleteVectors.readMerged(spark, root, "t", Seq("k")).count() === 99)
  }

  test("compact folds deletes in, clears them, and preserves content") {
    val root = freshRoot("compact")
    DeleteVectors.writeBase(base, root, "t")
    DeleteVectors.appendDeletes(Seq(2L, 4L, 6L).toDF("k"), root, "t")
    val before = DeleteVectors.readMerged(spark, root, "t", Seq("k"))
      .as[(Long, String)].collect().sortBy(_._1)
    DeleteVectors.compact(spark, root, "t", Seq("k"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/t/_deletes")),
      "delete dir must be gone after compact")
    val after = DeleteVectors.readMerged(spark, root, "t", Seq("k"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(before.sameElements(after))
    // and deletes appended AFTER a compact start a fresh delete set
    DeleteVectors.appendDeletes(Seq(10L).toDF("k"), root, "t")
    assert(DeleteVectors.readMerged(spark, root, "t", Seq("k")).count() === 96)
  }
}

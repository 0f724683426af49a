package graft.sql

import graft.SparkTestBase
import graft.lake.Snapshots
import org.apache.spark.sql.functions._

/** `SELECT * FROM <catalog>.<t>.files` — per-version file introspection
  * from the manifest + stats sidecar (path, added-at attribution, exact
  * bytes/rows, min/max stats map), the last of the metadata triple
  * beside `.history` and `.changes`.
  */
class FilesMetadataSpec extends SparkTestBase {
  import spark.implicits._

  test("one row per live file: added-at attribution, exact bytes/rows, " +
      "stats map, version pinning via conf") {
    val root = java.nio.file.Files.createTempDirectory("files_meta").toString
    Snapshots.commit((0L until 20L).map(i => (i, i % 2)).toDF("id", "p")
      .repartition(1), root, "t", Seq("p"), statsCols = Seq("id"))
    Snapshots.append((20L until 25L).map(i => (i, i % 2)).toDF("id", "p")
      .repartition(1), root, "t", Seq("p"), statsCols = Seq("id"))
    GraftCatalog.install(spark, "gfm", root)

    val rows = spark.sql(
      "SELECT file, version, added_at_version, bytes, rows, stats " +
        "FROM gfm.t.files")
      .as[(String, Long, Long, Option[Long], Option[Long], Map[String, String])]
      .collect()
    val m2 = Snapshots.manifest(spark, root, "t", 2L)
    assert(rows.map(_._1).toSet === m2.files.toSet)
    assert(rows.forall(_._2 == 2L))
    // attribution matches the manifest
    assert(rows.map(r => r._1 -> r._3).toMap === m2.addedAtOf)
    // bytes are the exact on-disk lengths
    rows.foreach { r =>
      val real = new java.io.File(s"$root/t/data/${r._1}").length()
      assert(r._4.contains(real), s"bytes of ${r._1}")
    }
    // row counts sum to the table
    assert(rows.flatMap(_._5).sum === 25L)
    // stats: v1's files carry min/max for id (statsCols); v2's appended
    // files carry them too (stats continuity through the sidecar schema)
    val v1files = rows.filter(_._3 == 1L)
    assert(v1files.nonEmpty &&
      v1files.forall(r => r._6.contains("min_id") && r._6.contains("max_id")))
    // whole-table min across file stats is the table min
    assert(rows.flatMap(_._6.get("min_id")).map(_.toLong).min === 0L)
    assert(rows.flatMap(_._6.get("max_id")).map(_.toLong).max === 24L)

    // pin an earlier version
    spark.conf.set("spark.graft.files.version", "1")
    try {
      val v1 = spark.sql("SELECT file, version FROM gfm.t.files")
        .as[(String, Long)].collect()
      assert(v1.map(_._1).toSet ===
        Snapshots.manifest(spark, root, "t", 1L).files.toSet)
      assert(v1.forall(_._2 == 1L))
    } finally spark.conf.unset("spark.graft.files.version")
  }
}

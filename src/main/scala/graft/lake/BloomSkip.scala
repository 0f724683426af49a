package graft.lake

import org.apache.spark.sql.{DataFrame, Column, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter file skipping — point-lookup pruning where min/max
  * manifests are blind.
  *
  * [[FileStats]]/[[ZOrder]] prune RANGE predicates, but they need the
  * write to be clustered on the probed column; a point lookup on a
  * high-cardinality key that the layout was NOT clustered by (orderkey
  * inside date-partitioned files — the reference's accession-number
  * lookups in a date-laid-out lake, storage/s3_manager.py:141-162) hits
  * every file: each file's [min, max] spans nearly the whole key domain.
  * Delta and Iceberg solve this with per-file bloom filters; this is that
  * manifest without a table format.
  *
  * Design for 100 TB:
  *  - the per-file filter is a fixed 65,536-bit bloom stored SPARSE —
  *    (file, word, bits) rows for only the 64-bit words with any bit set
  *    (≤ 1,024 rows per file; at 10⁵ files the whole manifest is ≤ 10⁸
  *    cheap rows and, after the word-level bit_or, usually far fewer —
  *    still broadcast-joinable against a probe set).
  *  - the build is one explode + one (file, word) groupBy over data that
  *    is being written anyway — no driver loop over files, no collect.
  *  - probe positions are Column expressions (`xxhash64(key, i) mod m`)
  *    on BOTH sides, so the build and the probe can never disagree on the
  *    hash (no driver-side reimplementation to drift).
  *  - a key's K positions are all set in its file's filter by
  *    construction, so skipping has NO false negatives; false positives
  *    only cost an extra file open, and the exact semi-join in
  *    [[readPoints]] removes their rows from the result.
  *
  * Sizing: 65,536 bits / K=5 keeps the fill factor under ~20% up to
  * ~2.5 k distinct keys per file; for 1 GB files (~10⁶ keys) scale `Bits`
  * to 2²³ — the manifest stays sparse-encoded either way.
  */
object BloomSkip {

  /** Bits per file filter (2^16: word-sparse 8 KiB dense equivalent). */
  val Bits = 65536L
  /** Probe positions per key. */
  val K = 5

  private def bloomPath(path: String) = s"${path.stripSuffix("/")}__filebloom"

  /** Position i for `key`: xxhash64 over the (long key, long i) pair —
    * identical expression at build and probe time.
    */
  private def position(key: Column, i: Column): Column =
    pmod(xxhash64(key.cast("long"), i.cast("long")), lit(Bits))

  /** (word, mask) probe rows for each key in `keyed` — K rows per input
    * row via a constant-width explode (no join).
    */
  private def positions(keyed: DataFrame, key: Column): DataFrame =
    keyed
      .withColumn("__pos",
        explode(array((0 until K).map(i => position(key, lit(i))): _*)))
      .withColumn("word", (col("__pos") / 64).cast("long"))
      .withColumn("mask", expr("shiftleft(1L, cast(__pos % 64 as int))"))
      .drop("__pos")

  /** Write `df` into `numFiles` UNCLUSTERED files (hash-spread — the
    * honest layout for this operator: a clustered layout would let
    * min/max prune instead), then derive the per-file sparse bloom
    * manifest over `keyCol` from the files actually written
    * (`_metadata.file_path`, same discipline as [[FileStats]]).
    */
  def writeWithBloom(df: DataFrame, path: String, keyCol: String,
      numFiles: Int): Unit = {
    val spark = df.sparkSession
    df.repartition(numFiles, col(keyCol))
      .write.mode("overwrite").parquet(path)
    positions(
      spark.read.parquet(path)
        .select(col("_metadata.file_path").as("file_path"),
          col(keyCol).as("__k")),
      col("__k"))
      .groupBy(col("file_path"), col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
      .coalesce(1) // manifest: ≤ Bits/64 rows per file — driver-tiny here
      .write.mode("overwrite").parquet(bloomPath(path))
  }

  /** Files that MAY contain any key in `keys` (single long key column):
    * a file qualifies for a key iff all K of the key's probe words carry
    * the probed bit. Manifest-sized result — exposed for pruning
    * assertions.
    */
  def candidateFiles(spark: SparkSession, path: String,
      keys: DataFrame): Seq[String] = {
    val keyCol = keys.columns.head
    val probe = positions(
      keys.select(col(keyCol).cast("long").as("__k")).distinct(), col("__k"))
    val man = spark.read.parquet(bloomPath(path))
    probe
      .join(broadcast(man), Seq("word"))
      .filter((col("bits").bitwiseAND(col("mask"))) =!= 0)
      .groupBy(col("file_path"), col("__k"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === K)
      .select("file_path").distinct()
      .collect() // one row per qualifying FILE — manifest-sized, not data
      .map(_.getString(0)).toSeq.sorted
  }

  def totalFiles(spark: SparkSession, path: String): Long =
    spark.read.parquet(bloomPath(path)).select("file_path").distinct().count()

  /** Pruned point-lookup batch: open only bloom-candidate files, then
    * remove false positives with an exact broadcast semi-join on the key
    * set. Result ≡ `spark.read.parquet(path).join(keys, semi)` by
    * construction.
    */
  def readPoints(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame): DataFrame = {
    val keyName = keys.columns.head
    val files = candidateFiles(spark, path, keys)
    val base =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.join(
      broadcast(keys.select(col(keyName).as(keyCol)).distinct()),
      Seq(keyCol), "left_semi")
  }
}

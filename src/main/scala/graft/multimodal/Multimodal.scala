package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extract as batch-friendly partition transforms.
  *
  * The decode step is a STUB — image/audio codecs are not available in this
  * environment — implemented as a deterministic fake so the Spark-side
  * plumbing (schema, partitioning, batch iteration, output shape) is real
  * and tested. Swap [[decodeStub]] for a real codec (or route the partition
  * iterator to an external inference service) without touching the plan.
  */
object Multimodal {

  /** Canonical multimodal schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType), // "image" | "audio" | "video"
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType),
    StructField("checksum", StringType),
    StructField("feature", ArrayType(FloatType))))

  /** Deterministic fake "decode + feature extraction" for one payload:
    * 8 floats derived from byte statistics. Replace with a real codec.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0.0f)
    val n = bytes.length
    (0 until 8).map { i =>
      var acc = 0L
      var j = i
      while (j < n) { acc = (acc * 31 + (bytes(j) & 0xff)) % 1000003L; j += 8 }
      (acc.toFloat / 1000003.0f) * 2 - 1
    }.toArray
  }

  /** Feature extraction over media rows, batched per partition (the Scala
    * analogue of `mapInPandas`: one iterator pass, no per-row task overhead,
    * arbitrary native/external calls allowed inside the partition).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val nBytes = if (payload == null) 0 else payload.length
          val checksum = if (payload == null) null
            else java.security.MessageDigest.getInstance("MD5")
              .digest(payload).map("%02x".format(_)).mkString
          Row(id, nBytes, checksum, decodeStub(payload))
        }
      }(enc)
  }

  /** Frame-sampling stub for video-like payloads: slice the payload into
    * `frames` equal chunks and emit one row per sampled chunk — the explode
    * shape a real frame sampler produces.
    */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame =
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_bytes",
        expr(s"substring(payload, frame_idx * (octet_length(payload) div $frames) + 1, " +
          s"octet_length(payload) div $frames)"))
      .select(col("media_id"), col("frame_idx"), col("frame_bytes"))

  /** Wrap a text corpus as fake media rows (payload = UTF-8 bytes) so the
    * multimodal path is exercisable on the driver fixtures.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("image").as("media_type"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))
}

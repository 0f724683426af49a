package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Once-per-fixture synthesis cache for the media gates.
  *
  * The q127/q167/q168/q184 gates assemble REAL containers (BMP/WAV/AVI/
  * JPEG payloads) from deterministic formulas. That synthesis is gate
  * scaffolding, not the operator under test — left inline it dominates
  * the bench numbers (round-8 verdict: q167/q168/q127 timings measured
  * Column-byte-math payload building, not decode+hash+join). Here each
  * payload set is synthesized ONCE per (fixture dir, source fingerprint),
  * persisted as parquet under a dir-keyed /tmp root (the working-notes
  * invariant for gate fixtures — concurrent JVMs at different SFs must
  * not race on a shared path), and read back on every subsequent call, so
  * timed runs measure the operators.
  *
  * Staleness: the cache path embeds a fingerprint of the source id set
  * (count + id sum, one dimension-sized aggregate); a regenerated or
  * blown-up fixture lands on a different path and rebuilds. Concurrency:
  * builders write to a private dir and atomically rename into place —
  * rename(2) fails when the destination exists, so the loser deletes its
  * copy and reads the winner's.
  *
  * Synthesis seconds are recorded per build and surfaced by
  * [[timingsFor]] so Bench can report them SEPARATELY from query cost.
  *
  * The fingerprint covers the SOURCE ids, not the synthesis formula: if
  * a builder's payload formula changes, BUMP ITS NAME (e.g. append _v2)
  * or the cache will serve stale payloads and the oracle will mismatch
  * confusingly.
  */
object MediaFixtures {

  private def root(dir: String) = s"/tmp/graft_media_${math.abs(dir.hashCode)}"

  /** Synthesize-once wrapper: returns the cached parquet if present for
    * the current source fingerprint, else builds, persists, reads back.
    */
  def cached(s: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = {
    // dimension-sized aggregate (one row) fingerprints the source id set
    val fp = Tables.documents(s, dir)
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("ids")).collect()(0)
    val dest = s"${root(dir)}/$name/fp=${fp.getLong(0)}_${fp.getLong(1)}"
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(destPath)) {
      val t0 = System.nanoTime()
      val tmp = new Path(s"${root(dir)}/$name/__build_${java.util.UUID.randomUUID()}")
      build.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val secs = (System.nanoTime() - t0) / 1e9
      if (!fs.rename(tmp, destPath)) fs.delete(tmp, true) // lost the race
      else {
        val w = fs.create(new Path(dest + ".sec"), true)
        w.write(f"$secs%.3f".getBytes("UTF-8")); w.close()
        // stderr, never stdout: Bench's stdout is a one-JSON-line contract
        System.err.println(f"[media-fixture] $name synthesized in $secs%.2fs → $dest")
      }
    }
    s.read.parquet(dest)
  }

  /** Builders for every media gate, name → synthesized payload frame.
    * Gates call these; Bench prebuilds them in warmup so even a fresh box
    * times the operators, not the scaffolding.
    */
  val builders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bmp_scramble_83_v2" -> (bmpScramble83 _),
    "wav_scramble_89_v2" -> (wavScramble89 _),
    "avi_scramble_97_v2" -> (aviScramble97 _),
    "jpeg_pattern_5" -> (jpegPattern5 _))

  /** Synthesis seconds recorded for each already-built fixture of `dir`. */
  def timingsFor(s: SparkSession, dir: String): Map[String, Double] = {
    val fs = new Path(root(dir))
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    builders.keys.flatMap { name =>
      val d = new Path(s"${root(dir)}/$name")
      if (!fs.exists(d)) None
      else fs.listStatus(d).filter(_.getPath.getName.endsWith(".sec"))
        .headOption.map { st =>
          val in = fs.open(st.getPath)
          val b = new Array[Byte](st.getLen.toInt)
          in.readFully(b); in.close()
          name -> new String(b, "UTF-8").trim.toDouble
        }
    }.toMap
  }

  /** q167's %83-seeded scramble BMPs (copy-distinct seeds — see the q167
    * scaladoc for the blowup rationale). */
  def bmpScramble83(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "bmp_scramble_83_v2") {
      val seed = col("doc_id") % 83 + (col("doc_id") / 100000000L).cast("long") * 83
      val w = (lit(8) + seed % 9).cast("int")
      val h = (lit(8) + seed % 7).cast("int")
      // spread BEFORE the Column-byte-math synthesis: a single-file
      // fixture plans one input split and serializes the encode
      graft.operators.Parallelism.spread(Tables.documents(s, dir))
        .select(col("doc_id").as("media_id"),
          graft.multimodal.Multimodal.syntheticBmpScramble(seed, w, h)
            .as("payload"))
    }

  /** q168's %89-seeded scramble WAVs (1024 16-bit PCM samples). */
  def wavScramble89(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "wav_scramble_89_v2") {
      val seed = col("doc_id") % 89 + (col("doc_id") / 100000000L).cast("long") * 89
      graft.operators.Parallelism.spread(Tables.documents(s, dir))
        .select(col("doc_id").as("media_id"),
          graft.multimodal.Multimodal.syntheticWavScramble(seed, lit(1024))
            .as("payload"))
    }

  /** q184's %97-seeded scramble AVIs: same-seed clips render the same
    * content sequence at phases 0-2 — temporally shifted clones. */
  def aviScramble97(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "avi_scramble_97_v2") {
      val seed = col("doc_id") % 97 + (col("doc_id") / 100000000L).cast("long") * 97
      val phase = ((col("doc_id") % 100000000L) / 97).cast("long") % 3
      val w = (lit(8) + seed % 9).cast("int")
      val h = (lit(8) + seed % 7).cast("int")
      val nf = (lit(4) + seed % 2).cast("int")
      graft.operators.Parallelism.spread(Tables.documents(s, dir))
        .select(col("doc_id").as("media_id"),
          graft.multimodal.Multimodal
            .syntheticAviScramble(seed, w, h, nf, phase).as("payload"))
    }

  /** q127's JDK-encoded baseline JPEGs over the gradient-ramp formula
    * `min(32 + id%16 + 2y + 2x + 3ch, 255)` at quality 0.95 — (media_id,
    * w, h, payload); the gate decodes these with [[graft.multimodal
    * .JpegDecode]] and cross-checks against the JDK's own decoder.
    */
  def jpegPattern5(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "jpeg_pattern_5") {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").cast("long").as("media_id"),
          (lit(16) + (col("doc_id") % 3) * 8).cast("int").as("w"),
          (lit(16) + (col("doc_id") % 2) * 8).cast("int").as("h"))
      val outSchema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("w", IntegerType, nullable = false),
        StructField("h", IntegerType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      graft.operators.Parallelism.spread(geom).mapPartitions { rows =>
        // memory-cached ImageIO streams JVM-wide: the default file cache
        // creates+deletes a /tmp file per call
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          def px(y: Int, x: Int, ch: Int): Int =
            math.min(32 + (id % 16).toInt + 2 * y + 2 * x + 3 * ch, 255)
          val src = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              src.setRGB(x, y,
                (px(y, x, 0) << 16) | (px(y, x, 1) << 8) | px(y, x, 2))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val writer =
            javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
          val params = writer.getDefaultWriteParam
          params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          params.setCompressionQuality(0.95f)
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(src, null, null), params)
          ios.close(); writer.dispose()
          org.apache.spark.sql.Row(id, w, h, bos.toByteArray)
        }
      }(enc)
    }

  /** Build every media fixture for `dir` (idempotent), for Bench warmup. */
  def prebuild(s: SparkSession, dir: String): Unit =
    builders.values.foreach(b => b(s, dir).count())
}

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
    "jpeg_pattern_5" -> (jpegPattern5 _),
    "jpeg_progressive_19" -> (jpegProgressive19 _),
    "jpeg_arith_13_v1" -> (jpegArith13 _),
    "jpeg_12bit_29_v1" -> (jpeg12Bit29 _),
    "jpeg_arithprog_31_v1" -> (jpegArithProg31 _),
    "jpeg_hier_37_v1" -> (jpegHier37 _),
    "jpeg_lossless_41_v1" -> (jpegLossless41 _),
    "png_palette_7" -> (pngPalette7 _),
    "png_adam7_11" -> (pngAdam7_11 _),
    "png16_23" -> (png16_23 _),
    "bmp_rle8_13" -> (bmpRle8_13 _),
    "bmp_rle4_17" -> (bmpRle4_17 _),
    "bmp_scramble_83_v2_dhash" -> (bmpDhash83 _),
    "avi_scramble_97_v2_framehash" -> (aviFrameHashes97 _))

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
    jdkJpegs(s, dir, "jpeg_pattern_5", mod = 5, progressive = false)

  /** q199's PROGRESSIVE (SOF2) JDK-encoded JPEGs — identical gradient
    * formula to [[jpegPattern5]] (every 19th document) but written with
    * ImageIO's MODE_DEFAULT progression script (spectral selection +
    * successive approximation, the libjpeg 10-scan schedule). Same pixels,
    * different entropy layout: the q199 oracle is q127's formula replay on
    * its own slice, so a scan-script, EOB-run, or refinement bug breaks
    * q199 while q127 stays green. Widths 16/24/32 at the JDK's default
    * 4:2:0 give Y-component block grids narrower than the MCU-padded
    * storage grid (24→3 blocks vs 4), keeping the non-interleaved scan
    * geometry of T.81 A.2.2 live in the gate.
    */
  def jpegProgressive19(s: SparkSession, dir: String): DataFrame =
    jdkJpegs(s, dir, "jpeg_progressive_19", mod = 19, progressive = true)

  /** q215's ARITHMETIC-PROGRESSIVE (SOF10) JPEGs — the q127 gradient on
    * every 31st document through [[graft.multimodal.JpegArithEncode
    * .encodeProgressive]]'s annex-G scan script (interleaved DC first +
    * DC refinement + per-component AC first/refinement, 8 scans, each
    * with its own QM coder and statistics).
    */
  def jpegArithProg31(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "jpeg_arithprog_31_v1") {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % 31 === 0)
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
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          def px(y: Int, x: Int, ch: Int): Int =
            math.min(32 + (id % 16).toInt + 2 * y + 2 * x + 3 * ch, 255)
          val bytes = graft.multimodal.JpegArithEncode
            .encodeProgressive(w, h, 3, px, quant = 2)
          org.apache.spark.sql.Row(id, w, h, bytes)
        }
      }(enc)
    }

  /** q216's HIERARCHICAL (annex J, DHP + SOF9 + differential SOF13)
    * JPEGs — the q127 gradient on every 37th document: a quant-16 base
    * frame refined by a quant-1 sample-domain residual frame. The base
    * alone is visibly coarse, so a decoder that ignores the differential
    * frame (or quarantines DHP, the pre-round-13 behavior) flips the
    * formula verdicts.
    */
  def jpegHier37(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "jpeg_hier_37_v1") {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % 37 === 0)
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
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          def px(y: Int, x: Int, ch: Int): Int =
            math.min(32 + (id % 16).toInt + 2 * y + 2 * x + 3 * ch, 255)
          val bytes = graft.multimodal.JpegArithEncode
            .encodeHierarchical(w, h, 3, px, quantBase = 16)
          org.apache.spark.sql.Row(id, w, h, bytes)
        }
      }(enc)
    }

  /** q217's LOSSLESS (SOF3, annex H) JPEGs — pseudo-noise content (a
    * mixing formula, deliberately NOT smooth: lossless must be exact on
    * arbitrary data, not DCT-friendly gradients) on every 41st document,
    * with the predictor cycling over all seven annex-H choices by id.
    */
  def jpegLossless41(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "jpeg_lossless_41_v1") {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % 41 === 0)
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
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          def px(y: Int, x: Int, ch: Int): Int =
            (((id % 251) * 31 + y * 17 + x * 7 + ch * 3) % 256).toInt
          val bytes = graft.multimodal.JpegLosslessEncode.encode(
            w, h, 3, px, predictor = 1 + (id % 7).toInt)
          org.apache.spark.sql.Row(id, w, h, bytes)
        }
      }(enc)
    }

  /** q214's 12-BIT (precision 12, SOF9) JPEGs — a gradient whose samples
    * live ABOVE the 8-bit range (512 + 16·(id%16) + 32y + 32x + 48ch,
    * capped 4095) on every 29th document, encoded by
    * [[graft.multimodal.JpegArithEncode]] at quant 2. An 8-bit-assuming
    * decoder clamps the whole image to 255 and flips every verdict.
    */
  def jpeg12Bit29(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "jpeg_12bit_29_v1") {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % 29 === 0)
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
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          def px(y: Int, x: Int, ch: Int): Int =
            math.min(512 + (id % 16).toInt * 16 + 32 * y + 32 * x + 48 * ch, 4095)
          val bytes = graft.multimodal.JpegArithEncode.encode(
            w, h, 3, px, quant = 2, precision = 12)
          org.apache.spark.sql.Row(id, w, h, bytes)
        }
      }(enc)
    }

  /** q212's ARITHMETIC-coded (SOF9) JPEGs — the q127 gradient formula on
    * every 13th document, encoded by the in-repo
    * [[graft.multimodal.JpegArithEncode]] (ImageIO cannot write
    * arithmetic streams) at flat quant 2; even ids add a 2-MCU restart
    * interval so RST resync + statistics reset stay live in the gate.
    * Geometry matches q127 (16/24/32 × 16/24).
    */
  def jpegArith13(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "jpeg_arith_13_v1") {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % 13 === 0)
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
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          def px(y: Int, x: Int, ch: Int): Int =
            math.min(32 + (id % 16).toInt + 2 * y + 2 * x + 3 * ch, 255)
          val bytes = graft.multimodal.JpegArithEncode.encode(
            w, h, 3, px, quant = 2,
            restartInterval = if (id % 2 == 0) 2 else 0)
          org.apache.spark.sql.Row(id, w, h, bytes)
        }
      }(enc)
    }

  private def jdkJpegs(s: SparkSession, dir: String, cacheName: String,
      mod: Int, progressive: Boolean): DataFrame =
    cached(s, dir, cacheName) {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % mod === 0)
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
          if (progressive)
            params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(src, null, null), params)
          ios.close(); writer.dispose()
          org.apache.spark.sql.Row(id, w, h, bos.toByteArray)
        }
      }(enc)
    }

  /** q194's palette PNGs — REAL indexed-color containers (color type 3,
    * PLTE + zlib IDAT + correct CRCs, so the JDK's own PNG reader accepts
    * them) over md5-mixed formulas both engines can replay: the image at
    * seed = doc_id (every 7th document) has bit depth 2^(doc_id % 4) ∈
    * {1,2,4,8}, palette entry (k, ch) = md5("id_k_ch")[3..4] as hex, and
    * pixel index (r, c) = md5("id_r_c")[1..2] % ncolors. Scanline filters
    * cycle None/Sub/Up by row so the de-filter path is live on packed
    * sub-byte streams. Returns (media_id, payload).
    */
  def pngPalette7(s: SparkSession, dir: String): DataFrame =
    palettePngs(s, dir, "png_palette_7", mod = 7, interlaced = false)

  /** q195's Adam7-INTERLACED palette PNGs — identical palette/pixel/
    * geometry formulas to [[pngPalette7]] (seed = doc_id, every 11th
    * document) but packed as the seven Adam7 sub-images (IHDR interlace
    * = 1), each pass independently filtered on the None/Sub/Up cycle by
    * PASS row. Same pixels, different container layout: the q195 oracle
    * is q194's formula replay verbatim, so any pass-geometry, scatter,
    * or per-pass filter bug breaks the hash while q194 stays green.
    */
  def pngAdam7_11(s: SparkSession, dir: String): DataFrame =
    palettePngs(s, dir, "png_adam7_11", mod = 11, interlaced = true)

  private def palettePngs(s: SparkSession, dir: String, cacheName: String,
      mod: Int, interlaced: Boolean): DataFrame =
    cached(s, dir, cacheName) {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % mod === 0)
        .select(col("doc_id").cast("long").as("media_id"),
          (lit(8) + col("doc_id") % 5).cast("int").as("w"),
          (lit(8) + col("doc_id") % 3).cast("int").as("h"),
          (col("doc_id") % 4).cast("int").as("dsel"))
      val outSchema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      graft.operators.Parallelism.spread(geom).mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(v: String): String =
          md.digest(v.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
        def chunk(out: java.io.ByteArrayOutputStream, typ: String,
            data: Array[Byte]): Unit = {
          def be(v: Int): Array[Byte] = Array(
            (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
          out.write(be(data.length))
          val t = typ.getBytes("US-ASCII")
          out.write(t); out.write(data)
          val crc = new java.util.zip.CRC32()
          crc.update(t); crc.update(data)
          out.write(be(crc.getValue.toInt))
        }
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          val depth = 1 << r.getInt(3) // 1/2/4/8 bits per index
          val nc = 1 << depth
          val plte = new Array[Byte](nc * 3)
          for (k <- 0 until nc; ch <- 0 until 3)
            plte(k * 3 + ch) = Integer.parseInt(
              md5hex(s"${id}_${k}_${ch}").substring(2, 4), 16).toByte
          // full-frame palette-index grid from the md5 formula
          val idxGrid = Array.tabulate(h, w) { (rr, cc) =>
            Integer.parseInt(md5hex(s"${id}_${rr}_${cc}").substring(0, 2), 16) % nc
          }
          // pack one scanline of indices MSB-first at `depth` bits each
          def pack(indices: Array[Int]): Array[Byte] = {
            val row = new Array[Byte]((indices.length * depth + 7) / 8)
            var c = 0
            while (c < indices.length) {
              val bitPos = c * depth
              row(bitPos >> 3) = (row(bitPos >> 3) |
                (indices(c) << (8 - depth - (bitPos & 7)))).toByte
              c += 1
            }
            row
          }
          // emit one pass (an independent sub-image): filters cycle
          // None/Sub/Up by PASS row (bpp = 1 byte at depth ≤ 8); Up on
          // the first pass row sees no prior row → plain values
          val filtered = new java.io.ByteArrayOutputStream()
          def emitPass(passRows: Array[Array[Int]]): Unit = {
            val packed = passRows.map(pack)
            for (rr <- packed.indices) {
              val f = rr % 3
              filtered.write(f)
              val cur = packed(rr)
              for (x <- cur.indices) {
                val v = cur(x) & 0xff
                val out = f match {
                  case 0 => v
                  case 1 => v - (if (x >= 1) cur(x - 1) & 0xff else 0)
                  case _ => v - (if (rr > 0) packed(rr - 1)(x) & 0xff else 0)
                }
                filtered.write(out & 0xff)
              }
            }
          }
          if (!interlaced) emitPass(idxGrid)
          else for ((rs, cs, rStr, cStr) <- Seq((0, 0, 8, 8), (0, 4, 8, 8),
              (4, 0, 8, 4), (0, 2, 4, 4), (2, 0, 4, 2), (0, 1, 2, 2),
              (1, 0, 2, 1))) {
            val passRows = (rs until h by rStr).map { fr =>
              (cs until w by cStr).map(fc => idxGrid(fr)(fc)).toArray
            }.filter(_.nonEmpty).toArray
            if (passRows.nonEmpty) emitPass(passRows)
          }
          val deflated = {
            val d = new java.util.zip.Deflater()
            d.setInput(filtered.toByteArray); d.finish()
            val buf = new Array[Byte](filtered.size() + 64)
            val bos = new java.io.ByteArrayOutputStream()
            while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
            d.end(); bos.toByteArray
          }
          val png = new java.io.ByteArrayOutputStream()
          png.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
            .map(_.toByte))
          val ihdr = java.nio.ByteBuffer.allocate(13)
            .putInt(w).putInt(h)
            .put(depth.toByte).put(3.toByte) // color type 3 = palette
            .put(0.toByte).put(0.toByte)
            .put((if (interlaced) 1 else 0).toByte).array()
          chunk(png, "IHDR", ihdr)
          chunk(png, "PLTE", plte)
          chunk(png, "IDAT", deflated)
          chunk(png, "IEND", Array.empty[Byte])
          org.apache.spark.sql.Row(id, png.toByteArray)
        }
      }(enc)
    }

  /** q200's 16-BIT truecolor PNGs (the last PNG depth quarantine,
    * lifted): color type 2 at bit depth 16 — each sample is a big-endian
    * byte PAIR, so the filter stride is 6 bytes/pixel and Sub/Up operate
    * on bytes that straddle sample halves. Sample (r, c, ch) =
    * md5("id_r_c_ch")[0..3] as hex ∈ [0, 65535] (md5-mixed per the
    * near-dup invariant; here it also keeps both bytes of every pair
    * live). Scanline filters cycle None/Sub/Up by row. Every 23rd
    * document; returns (media_id, payload).
    */
  def png16_23(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "png16_23") {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % 23 === 0)
        .select(col("doc_id").cast("long").as("media_id"),
          (lit(8) + col("doc_id") % 5).cast("int").as("w"),
          (lit(8) + col("doc_id") % 3).cast("int").as("h"))
      val outSchema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      graft.operators.Parallelism.spread(geom).mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(v: String): String =
          md.digest(v.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
        def chunk(out: java.io.ByteArrayOutputStream, typ: String,
            data: Array[Byte]): Unit = {
          def be(v: Int): Array[Byte] = Array(
            (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
          out.write(be(data.length))
          val t = typ.getBytes("US-ASCII")
          out.write(t); out.write(data)
          val crc = new java.util.zip.CRC32()
          crc.update(t); crc.update(data)
          out.write(be(crc.getValue.toInt))
        }
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          val bpp = 6 // 3 channels × 2 bytes
          // raw scanlines: big-endian 16-bit samples, RGB interleaved
          val raws = Array.tabulate(h) { rr =>
            val row = new Array[Int](w * bpp)
            for (cc <- 0 until w; ch <- 0 until 3) {
              val v = Integer.parseInt(
                md5hex(s"${id}_${rr}_${cc}_${ch}").substring(0, 4), 16)
              row((cc * 3 + ch) * 2) = v >>> 8
              row((cc * 3 + ch) * 2 + 1) = v & 0xff
            }
            row
          }
          val filtered = new java.io.ByteArrayOutputStream()
          for (rr <- 0 until h) {
            val f = rr % 3 // None/Sub/Up cycle
            filtered.write(f)
            val cur = raws(rr)
            for (x <- cur.indices) {
              val out = f match {
                case 0 => cur(x)
                case 1 => cur(x) - (if (x >= bpp) cur(x - bpp) else 0)
                case _ => cur(x) - (if (rr > 0) raws(rr - 1)(x) else 0)
              }
              filtered.write(out & 0xff)
            }
          }
          val deflated = {
            val d = new java.util.zip.Deflater()
            d.setInput(filtered.toByteArray); d.finish()
            val buf = new Array[Byte](filtered.size() + 64)
            val bos = new java.io.ByteArrayOutputStream()
            while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
            d.end(); bos.toByteArray
          }
          val png = new java.io.ByteArrayOutputStream()
          png.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
            .map(_.toByte))
          val ihdr = java.nio.ByteBuffer.allocate(13)
            .putInt(w).putInt(h)
            .put(16.toByte).put(2.toByte) // depth 16, color type 2 (RGB)
            .put(0.toByte).put(0.toByte).put(0.toByte).array()
          chunk(png, "IHDR", ihdr)
          chunk(png, "IDAT", deflated)
          chunk(png, "IEND", Array.empty[Byte])
          org.apache.spark.sql.Row(id, png.toByteArray)
        }
      }(enc)
    }

  /** q197's RLE8 BMPs — REAL BI_RLE8 containers (8-bit palette indices,
    * run-length encoded, bottom-up) over md5-mixed formulas both engines
    * replay: 16 palette entries with channel (k, ch) = md5("id_k_ch")
    * [3..4] as hex; pixel index (r, c) = md5 of ("id_r_(c/2)") for c < 4
    * (adjacent pairs equal → ENCODED RUNS live) and of ("id_r_c_s")
    * beyond (random singletons → ABSOLUTE segments live), both [1..2]
    * % 16. Every scanline ends with the EOL escape; the stream ends with
    * EOF; absolute segments pad to the word boundary. Returns
    * (media_id, payload).
    */
  def bmpRle8_13(s: SparkSession, dir: String): DataFrame =
    rleBmps(s, dir, "bmp_rle8_13", mod = 13, bits = 8)

  /** q198's RLE4 BMPs — identical palette/pixel formulas to
    * [[bmpRle8_13]] (every 17th document) but BI_RLE4: encoded runs
    * carry the index in BOTH nibbles, absolute segments pack indices
    * MSB-first two per byte. Same pixels, different packing — the q198
    * oracle is q197's formula replay on the %17 slice, so a nibble-order
    * or padding bug breaks q198 while q197 stays green.
    */
  def bmpRle4_17(s: SparkSession, dir: String): DataFrame =
    rleBmps(s, dir, "bmp_rle4_17", mod = 17, bits = 4)

  private def rleBmps(s: SparkSession, dir: String, cacheName: String,
      mod: Int, bits: Int): DataFrame =
    cached(s, dir, cacheName) {
      import org.apache.spark.sql.types._
      val geom = Tables.documents(s, dir)
        .filter(col("doc_id") % mod === 0)
        .select(col("doc_id").cast("long").as("media_id"),
          (lit(8) + col("doc_id") % 5).cast("int").as("w"),
          (lit(8) + col("doc_id") % 3).cast("int").as("h"))
      val outSchema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      graft.operators.Parallelism.spread(geom).mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(v: String): String =
          md.digest(v.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
        rows.map { r =>
          val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
          val nc = 16
          def pix(rr: Int, cc: Int): Int =
            if (cc < 4)
              Integer.parseInt(md5hex(s"${id}_${rr}_${cc / 2}").substring(0, 2), 16) % nc
            else
              Integer.parseInt(md5hex(s"${id}_${rr}_${cc}_s").substring(0, 2), 16) % nc
          val rle = new java.io.ByteArrayOutputStream()
          // scanlines in FILE order = bottom-up: logical row h-1 first
          for (fr <- (h - 1) to 0 by -1) {
            val row = Array.tabulate(w)(pix(fr, _))
            def runByte(v: Int): Int = if (bits == 8) v else (v << 4) | v
            var c = 0
            while (c < w) {
              var run = 1
              while (c + run < w && row(c + run) == row(c) && run < 255) run += 1
              if (run >= 2) { rle.write(run); rle.write(runByte(row(c))); c += run }
              else {
                // singleton stretch: extend while no new run starts
                var e = c + 1
                while (e < w && (e + 1 >= w || row(e + 1) != row(e)) &&
                    e - c < 255) e += 1
                val len = e - c
                if (len >= 3) {
                  rle.write(0); rle.write(len)
                  if (bits == 8) {
                    for (i <- c until e) rle.write(row(i))
                    if (len % 2 == 1) rle.write(0) // pad to word boundary
                  } else {
                    // nibble-pack MSB-first, then pad bytes to a word
                    val nb = (len + 1) / 2
                    val packed = new Array[Int](nb)
                    for (i <- 0 until len)
                      packed(i / 2) |= row(c + i) << (if (i % 2 == 0) 4 else 0)
                    packed.foreach(rle.write)
                    if (nb % 2 == 1) rle.write(0)
                  }
                } else for (i <- c until e) { rle.write(1); rle.write(runByte(row(i))) }
                c = e
              }
            }
            rle.write(0); rle.write(0) // EOL
          }
          rle.write(0); rle.write(1) // EOF
          val data = rle.toByteArray
          val offBits = 14 + 40 + 4 * nc
          val bb = java.nio.ByteBuffer
            .allocate(offBits + data.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put('B'.toByte).put('M'.toByte)
            .putInt(offBits + data.length).putInt(0).putInt(offBits)
          bb.putInt(40).putInt(w).putInt(h)
            .putShort(1.toShort).putShort(bits.toShort)
            .putInt(if (bits == 8) 1 else 2) // BI_RLE8 / BI_RLE4
            .putInt(data.length).putInt(0).putInt(0)
            .putInt(nc).putInt(0)
          for (k <- 0 until nc) {
            def ch(i: Int): Byte = Integer.parseInt(
              md5hex(s"${id}_${k}_${i}").substring(2, 4), 16).toByte
            bb.put(ch(2)).put(ch(1)).put(ch(0)).put(0.toByte) // B,G,R,0
          }
          bb.put(data)
          org.apache.spark.sql.Row(id, bb.array())
        }
      }(enc)
    }

  /** Per-fixture cached dHash table of [[bmpScramble83]] (media_id,
    * dhash) — same discipline as the payload caches, one level up: gates
    * that need only the HASHES (q190's pair mining) read this instead of
    * re-decoding the same payloads a bench sweep already decoded for
    * q167. Byte-identical to `ImageHash.dhash(bmpScramble83(...))` by
    * construction. The cache name embeds the SOURCE builder's versioned
    * name — bump them together (a dHash formula change also needs a
    * bump here).
    */
  def bmpDhash83(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "bmp_scramble_83_v2_dhash") {
      graft.multimodal.ImageHash.dhash(bmpScramble83(s, dir))
    }

  /** Per-fixture cached frame-hash table of [[aviScramble97]] (media_id,
    * f, dhash) — lets q189's clustering start from hashes instead of
    * re-running q184's decode. Same bump-together rule as [[bmpDhash83]].
    */
  def aviFrameHashes97(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "avi_scramble_97_v2_framehash") {
      graft.multimodal.VideoHash.frameHashes(aviScramble97(s, dir))
    }

  /** Build every media fixture for `dir` (idempotent), for Bench warmup. */
  def prebuild(s: SparkSession, dir: String): Unit =
    builders.values.foreach(b => b(s, dir).count())
}

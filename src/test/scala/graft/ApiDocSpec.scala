package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** docs/API.md contract: every code block on that page appears here
  * verbatim (modulo the surrounding fixture setup) and must compile and
  * execute against the sf0.001 fixtures. If an example drifts from the
  * API, this suite — not a user — finds out.
  */
class ApiDocSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def tmp(name: String) = s"/tmp/graft_apidoc_$name"

  private def docs = graft.queries.Tables.documents(spark, dir)
    .select(col("doc_id"), col("source"), col("text"))
  private def emb = graft.queries.Tables.embeddings(spark, dir)

  /** symbol, security_id, start_date, end_date — the master schema every
    * client example consumes.
    */
  private def master = {
    val s = spark; import s.implicits._
    Seq(("SYM0", 7000L, "2024-01-01", "2024-06-30"),
        ("SYM0", 7002L, "2024-07-01", "2024-12-31"),
        ("SYM1", 7001L, "2024-01-01", "2024-12-31"))
      .toDF("symbol", "security_id", "start_s", "end_s")
      .select(col("symbol"), col("security_id"),
        col("start_s").cast("date").as("start_date"),
        col("end_s").cast("date").as("end_date"))
  }

  test("TicksClient example: getDailyTicks + getMinuteTicks") {
    val sess = spark; import sess.implicits._
    import graft.ticks.TicksClient
    val root = tmp("ticks")
    // fixture lake: daily bars for sid 7000/7001 across 2024, minute bars
    // for the 2024-03-10 DST day
    val daily = spark.range(0, 120).select(
      explode(array(lit(7000L), lit(7001L))).as("security_id"),
      date_add(lit("2024-01-02").cast("date"), col("id").cast("int")).as("date"),
      (col("id") * 10).cast("double").as("close"))
      .withColumn("year", year(col("date")))
    graft.lake.Lake.overwritePartitions(daily, root, "daily_ticks",
      Seq("security_id", "year"))
    val bars = spark.range(0, 60).select(
      lit(7000L).as("security_id"),
      (to_timestamp(lit("2024-03-10 06:00:00")).cast("long") + col("id") * 60)
        .cast("timestamp").as("ts"),
      col("id").as("volume"))
    TicksClient.rewriteMinuteTicks(bars, root)

    // --- docs/API.md: TicksClient ---
    val client = new TicksClient(spark, root, master)
    // daily bars, rename-aware across the range
    val dailyBars = client.getDailyTicks("SYM0", "2024-01-02", "2024-03-28")
    // one ET trading day of minute bars (DST-correct; day routed via master)
    val minutes = client.getMinuteTicks("SYM0", "2024-03-10")
    // split-adjusted reads: factors derived from a raw actions feed
    val actions = Seq((7000L, "2024-02-01", 2L, 1L))
      .toDF("security_id", "d", "num", "den")
      .select(col("security_id"), col("d").cast("date").as("date"),
        col("num"), col("den"))
    val adjusted = client.getDailyTicksAdjusted(
      "SYM0", "2024-01-02", "2024-03-28", actions)
    // --- end ---

    assert(dailyBars.count() > 0 && minutes.count() === 60)
    assert(dailyBars.columns.contains("symbol"))
    val adj = adjusted.select("date", "close_cents", "fden", "adj_milli")
      .as[(java.sql.Date, Long, Long, Long)].collect()
    val pre = adj.filter(_._1.toString < "2024-02-01")
    val post = adj.filter(_._1.toString >= "2024-02-01")
    assert(pre.nonEmpty && pre.forall(r => r._3 === 2L &&
      r._4 === math.round(r._2 * 1000.0 / 2)), "pre-split prices halve")
    assert(post.nonEmpty && post.forall(r => r._3 === 1L &&
      r._4 === r._2 * 1000), "post-split prices pass through")
  }

  test("Lake example: overwrite, read, compact, list") {
    import graft.lake.Lake
    val root = tmp("lake")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val df = spark.range(0, 100).select(
      (col("id") % 3 + 7000L).as("security_id"),
      (col("id") % 2 + 1995).cast("int").as("year"),
      col("id").as("v"))
    val years = Seq(1995, 1996)

    // --- docs/API.md: Lake ---
    Lake.overwritePartitions(df, root, "ticks",
      Seq("security_id", "year"))                  // dynamic partition overwrite
    val back  = Lake.read(spark, root, "ticks")    // pruned when filtered
    assert(back.count() === 100)                   // (count before the rewrite below)
    Lake.compactYears(spark, root, "ticks", years) // 1 file per (sid, year) target
    val parts = Lake.listPartitions(spark, root, "ticks")
    // --- end ---

    assert(parts.exists(_.contains("1995")))
    assert(Lake.read(spark, root, "ticks").count() === 100)
  }

  test("SecurityMaster example: resolveExact, resolve, symbolHistory") {
    import graft.master.SecurityMaster
    val s = spark; import s.implicits._
    val facts = Seq(("SYM0", "2024-02-01"), ("SYM0", "2024-08-01"),
        ("SYM1", "2024-05-05"), ("NOPE", "2024-05-05"))
      .toDF("symbol", "day_s")
      .select(col("symbol"), col("day_s").cast("date").as("day"))

    // --- docs/API.md: SecurityMaster ---
    val withSid  = SecurityMaster.resolveExact(facts, master)  // interval as-of join
    val resolved = SecurityMaster.resolve(facts, master)       // + fuzzy auto-resolve
    val history  = SecurityMaster.symbolHistory(master, sid = 7000L)
    // --- end ---

    val bySym = withSid.collect().map(r =>
      (r.getString(0), r.getDate(1).toString) -> r.get(2)).toMap
    assert(bySym(("SYM0", "2024-02-01")) === 7000L) // pre-rename interval
    assert(bySym(("SYM0", "2024-08-01")) === 7002L) // post-rename interval
    assert(bySym(("NOPE", "2024-05-05")) == null)
    assert(resolved.count() === 4 && history.count() > 0)
  }

  test("Dedup example: exact, nearDuplicates, simhash, clusters") {
    import graft.operators.Dedup

    // --- docs/API.md: Dedup ---
    val uniq  = Dedup.exact(docs, "text", "doc_id")          // min-id per content hash
    val pairs = Dedup.nearDuplicates(docs, "text", "doc_id", // MinHash→LSH→verify
      threshold = 0.2, numHashes = 32, bands = 8)
    val sim   = Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxDistance = 3)
    val clust = Dedup.clusters(pairs)                        // connected components
    val stars = Dedup.clustersByContraction(pairs)           // O(log diameter) variant
    // --- end ---

    assert(uniq.count() > 0 && uniq.count() <= docs.count())
    assert(pairs.columns.contains("id_a") && pairs.columns.contains("id_b"))
    sim.count(); clust.count() // execute the full chain
    // both clustering shapes agree wherever propagation converges
    val s = spark; import s.implicits._
    assert(stars.as[(Long, Long)].collect().toMap ===
      clust.as[(Long, Long)].collect().toMap)
  }

  test("Similarity/AnnIndex example: brute force + persisted index probe") {
    import graft.operators.{Similarity, AnnIndex}
    val idxRoot = tmp("annidx")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idxRoot), true)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val centroids = emb.filter(col("vec_id") % 25 === 3).limit(8)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))

    // history and today's batch are DISJOINT — append does not dedup
    val history = emb.filter(col("vec_id") % 7 =!= 3)
    val todaysBatch = emb.filter(col("vec_id") % 7 === 3)

    // --- docs/API.md: Similarity / AnnIndex ---
    val knn = Similarity.bruteForceTopK(emb, queries, k = 10)  // exact baseline

    AnnIndex.build(history, centroids, idxRoot)                // cell-partitioned index
    AnnIndex.append(todaysBatch, idxRoot)                      // daily incremental add
    val ann = AnnIndex.probe(spark, idxRoot, queries, k = 10, nprobe = 4)
    // --- end ---

    assert(knn.groupBy(col("query_id")).count()
      .agg(max(col("count"))).head().getLong(0) <= 10)
    assert(ann.count() > 0)
  }

  test("Cdc example: last-writer-wins merge with deletes") {
    import graft.operators.Cdc
    val s = spark; import s.implicits._
    val base = Seq((1L, 10L), (2L, 20L)).toDF("user_id", "balance_cents")
    val ops = Seq((1L, 5L, 100L, "U", 111L), (2L, 6L, 101L, "D", 0L),
        (3L, 7L, 102L, "U", 333L))
      .toDF("user_id", "ts_ns", "event_id", "op", "cents")

    // --- docs/API.md: Cdc ---
    val merged = Cdc.merge(base, ops,
      keyCols = Seq("user_id"), seqCols = Seq("ts_ns", "event_id"),
      opCol = "op", deleteOp = "D",
      valueCols = Map("balance_cents" -> col("cents")))
    // --- end ---

    val m = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 111L, 3L -> 333L)) // 2 deleted, 1 updated, 3 inserted
  }

  test("Assembly example: mixByWeights + capPerGroup") {
    import graft.operators.Assembly

    val docsFull = graft.queries.Tables.documents(spark, dir)

    // --- docs/API.md: Assembly ---
    val mixed  = Assembly.mixByWeights(docs, "source", "doc_id",
      weights = Map("web" -> 0.5, "news" -> 0.3), budget = 100L)
    val capped = Assembly.capPerGroup(docs, "source", "doc_id", k = 8)
    val split  = Assembly.groupHoldout(docs, "source")     // leakage-free by group
    val sample = Assembly.weightedSample(docsFull, "doc_id",
      weight = col("n_chars"), k = 1000)                   // A-ES, reproducible
    // --- end ---

    assert(mixed.filter(col("source") === "web").count() <= 50)
    assert(capped.groupBy(col("source")).count()
      .agg(max(col("count"))).head().getLong(0) <= 8)
    assert(split.groupBy("source")
      .agg(countDistinct("split").as("k")).filter(col("k") =!= 1).count() === 0)
    assert(sample.count() <= 1000)
  }

  test("QualityFilters example: gopher stats gate") {
    import graft.text.QualityFilters

    // --- docs/API.md: QualityFilters ---
    val stats = QualityFilters.gopherStats(docs, "text", "doc_id")
      .filter(col("n_tokens") >= 25 && col("dup_bigram_frac") <= 0.10)
    // --- end ---

    assert(stats.count() > 0)
  }

  test("Sentiment example: pipeline with the lexicon model") {
    import graft.text.{Sentiment, LexiconSentimentModel}
    val filings = docs.limit(20)

    // --- docs/API.md: Sentiment ---
    val scored = Sentiment.pipeline(filings, "text", Seq("doc_id"),
      model = new LexiconSentimentModel(), chunkSize = 1500, overlap = 200)
    // --- end ---

    assert(scored.count() === 20)
  }

  test("GraftCatalog example: lake tables as SQL") {
    val root = tmp("sqlcat")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    import spark.implicits._
    graft.lake.Lake.overwritePartitions(
      Seq((9000L, java.sql.Date.valueOf("2023-03-01"), 42L, 2023),
        (9002L, java.sql.Date.valueOf("2023-09-01"), 43L, 2023))
        .toDF("security_id", "date", "close_cents", "year"),
      root, "daily_ticks", Seq("security_id", "year"))
    graft.lake.Lake.overwritePartitions(
      Seq(("SYMR", 9000L, java.sql.Date.valueOf("2023-01-01"), java.sql.Date.valueOf("2023-06-30")),
        ("SYMR", 9002L, java.sql.Date.valueOf("2023-07-01"), java.sql.Date.valueOf("2023-12-31")))
        .toDF("symbol", "security_id", "start_date", "end_date"),
      root, "master", Seq.empty)

    // --- docs/API.md: GraftCatalog ---
    import graft.sql.GraftCatalog

    GraftCatalog.install(spark, "graft", root)
    val tables = spark.sql("SHOW TABLES IN graft")
    val closes = spark.sql("""
      SELECT m.symbol, t.date, t.close_cents
      FROM graft.daily_ticks t JOIN graft.master m
        ON t.security_id = m.security_id
       AND t.date BETWEEN m.start_date AND m.end_date
      WHERE m.symbol = 'SYMR' AND t.year = 2023""")
    // --- end ---

    assert(tables.select("tableName").as[String].collect().toSet ===
      Set("daily_ticks", "master"))
    assert(closes.select("close_cents").as[Long].collect().toSet === Set(42L, 43L))

    // a Snapshots-committed table resolves through its manifests
    graft.lake.Snapshots.commit(
      Seq((1L, 2020)).toDF("id", "year"), root, "dim", Seq("year"))
    graft.lake.Snapshots.commit(
      Seq((9L, 2020)).toDF("id", "year"), root, "dim", Seq("year"))
    // --- docs/API.md: GraftCatalog time travel ---
    spark.sql("SELECT * FROM graft.dim VERSION AS OF 1")
    // --- end ---
    assert(spark.sql("SELECT id FROM graft.dim VERSION AS OF 1")
      .as[Long].collect().toSeq === Seq(1L))
    assert(spark.sql("SELECT id FROM graft.dim")
      .as[Long].collect().toSeq === Seq(9L))

    // reshape dim for the DML block (id, pb) — fresh versioned table
    graft.lake.Snapshots.commit(
      spark.range(40, 45).select(col("id"), (col("id") % 4).as("pb")),
      root, "dim2", Seq("pb"))
    Seq((40L, 0L, "D"), (44L, 9L, "U"), (77L, 1L, "U"))
      .toDF("id", "pb", "op").createOrReplaceTempView("updates")
    // --- docs/API.md: GraftCatalog SQL DML --- (dim2 for the fresh shape)
    spark.sql("INSERT INTO graft.dim2 SELECT id, id % 4 AS pb FROM range(40, 50)")
    spark.sql("DELETE FROM graft.dim2 WHERE id >= 45 OR id IN (41)")
    spark.sql("UPDATE graft.dim2 SET pb = pb + 10 WHERE id = 43")
    spark.sql("""MERGE INTO graft.dim2 AS tgt USING updates AS s
                 ON tgt.id = s.id
                 WHEN MATCHED AND s.op = 'D' THEN DELETE
                 WHEN MATCHED THEN UPDATE SET pb = tgt.pb + s.pb
                 WHEN NOT MATCHED AND s.op <> 'D' THEN
                   INSERT (id, pb) VALUES (s.id, s.pb)""")
    // --- end ---
    // v1 = 40..44; INSERT doubled 40..44 and added 45..49; DELETE dropped
    // ≥45 and 41 (both copies); UPDATE moved both 43s to pb 13; MERGE
    // deleted the 40s, accumulated the 44s (0 + 9), inserted 77
    val end = spark.sql("SELECT id, pb FROM graft.dim2")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(end === Seq((42L, 2L), (42L, 2L), (43L, 13L), (43L, 13L),
      (44L, 9L), (44L, 9L), (77L, 1L)), end)
    // --- docs/API.md: GraftCatalog SQL DML, full-sync BY SOURCE ---
    spark.sql("""MERGE INTO graft.dim2 AS tgt USING updates AS s
                 ON tgt.id = s.id
                 WHEN MATCHED THEN UPDATE SET pb = s.pb
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    // --- end ---
    // the table converged to the source's matched keys: 42/43 (absent
    // from updates) dropped, both 44s took pb=9, 77 kept
    val synced = spark.sql("SELECT id, pb FROM graft.dim2")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(synced === Seq((44L, 9L), (44L, 9L), (77L, 1L)), synced)

    // --- docs/API.md: GraftCatalog SQL DDL ---
    spark.sql("""CREATE TABLE graft.bal (id BIGINT, cents BIGINT, pb BIGINT)
                 PARTITIONED BY (pb)""")
    spark.sql("INSERT INTO graft.bal SELECT id, id * 7 AS cents, id % 4 AS pb FROM range(20)")
    spark.sql("""CREATE TABLE graft.hot PARTITIONED BY (pb)
                 AS SELECT * FROM graft.bal WHERE cents > 70""")
    spark.sql("ALTER TABLE graft.bal ADD COLUMNS (tier STRING)")
    spark.sql("DROP TABLE graft.hot")
    // --- end ---
    assert(spark.sql("SELECT sum(cents) FROM graft.bal").as[Long].head() ===
      (0L until 20L).map(_ * 7).sum)
    assert(spark.table("graft.bal").schema.fieldNames.contains("tier"))
    assert(!spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("hot"))

    // --- docs/API.md: GraftCatalog SQL maintenance ---
    spark.sql("OPTIMIZE graft.bal ZORDER BY (id)") // -> (version, files before/after)
    spark.sql("VACUUM graft.bal KEEP 2 VERSIONS")  // -> (n_deleted)
    spark.sql("RESTORE TABLE graft.bal TO VERSION AS OF 3") // -> (version,
                                                   //     restored_from, n_files)
    // --- end ---
    assert(spark.sql("SELECT sum(cents) FROM graft.bal").as[Long].head() ===
      (0L until 20L).map(_ * 7).sum,
      "OPTIMIZE and RESTORE are result-invariant here")

    // state here: v3 (+tier) kept, v4 = optimize, v5 = restore-of-3
    // --- docs/API.md: column mapping + files metadata ---
    spark.sql("ALTER TABLE graft.bal RENAME COLUMN cents TO amount") // metadata-only
    spark.sql("ALTER TABLE graft.bal DROP COLUMN tier") // hides — bytes stay
    spark.sql("SELECT sum(amount) FROM graft.bal")           // old files, new name
    spark.sql("SELECT cents FROM graft.bal VERSION AS OF 5") // own names per version
    spark.sql("SELECT file, rows FROM graft.bal.files")      // per-file introspection
    // --- end ---
    assert(spark.sql("SELECT sum(amount) FROM graft.bal").as[Long].head() ===
      (0L until 20L).map(_ * 7).sum, "the rename touched no data")
    assert(spark.table("graft.bal").schema.fieldNames.toSeq ===
      Seq("id", "amount", "pb"))
    assert(spark.sql("SELECT * FROM graft.bal VERSION AS OF 5")
      .schema.fieldNames.contains("cents"), "time travel keeps old names")
    assert(spark.sql("SELECT sum(rows) FROM graft.bal.files")
      .as[Long].head() === 20L)
  }

  test("CDF streaming source + history example") {
    import graft.lake.Snapshots
    val root = tmp("cdfdoc")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    Snapshots.commit(spark.range(0, 5).select(col("id")), root, "t", Seq.empty)
    Snapshots.commit(spark.range(5, 8).select(col("id")), root, "t", Seq.empty)

    // --- docs/API.md: CDF streaming source ---
    val changes = spark.readStream.format("graft.sql.CdfSource")
      .option("root", root).option("table", "t")
      .load()   // data columns + _change_type (insert/delete) + _commit_version
    // --- end ---
    val q = changes.writeStream.format("memory").queryName("cdfdoc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("cdfdoc").count() === 8)
    assert(spark.table("cdfdoc").columns.toSet ===
      Set("id", "_change_type", "_commit_version"))

    val h = Snapshots.history(spark, root, "t")
    assert(h.columns.toSeq === Seq("version", "committed_at_millis",
      "operation", "n_files", "n_delete_vectors", "n_added_files"))
    assert(h.count() === 2)
  }

  test("batch table_changes + streaming toTable examples") {
    import graft.lake.Snapshots
    import graft.sql.GraftCatalog
    val sess = spark; import sess.implicits._
    val root = tmp("chgdoc")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    GraftCatalog.install(spark, "graft", root)
    Snapshots.commit(spark.range(0, 5).select(col("id")), root, "t", Seq.empty)
    Snapshots.commit(spark.range(5, 8).select(col("id")), root, "t", Seq.empty)
    Snapshots.commit(spark.range(8, 9).select(col("id")), root, "t", Seq.empty)

    // --- docs/API.md: batch change feed (table_changes) ---
    spark.conf.set("spark.graft.changes.startVersion", "2")  // default 1
    spark.conf.set("spark.graft.changes.endVersion", "3")    // default latest
    val oneShot = spark.sql("SELECT * FROM graft.t.changes") // inclusive window
    // --- end ---
    spark.conf.unset("spark.graft.changes.startVersion")
    spark.conf.unset("spark.graft.changes.endVersion")
    assert(oneShot.count() === 4) // v2's 3 inserts + v3's 1
    assert(oneShot.columns.toSet ===
      Set("id", "_change_type", "_commit_version"))

    // streaming sink: writeStream.toTable through the snapshot protocol
    val srcDir = s"$root/_src"; val cp = s"$root/_cp"
    spark.range(100, 110).select(col("id")).write.parquet(srcDir)
    val srcSchema = spark.read.parquet(srcDir).schema
    // --- docs/API.md: streaming write into a versioned table ---
    val q = spark.readStream.schema(srcSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .toTable("graft.t")
    q.awaitTermination()
    // --- end ---
    assert(spark.sql("SELECT count(*) FROM graft.t").as[Long].head() === 19L)
    // exactly-once: a checkpointed re-run with no new files appends nothing
    val q2 = spark.readStream.schema(srcSchema).parquet(srcDir)
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).toTable("graft.t")
    q2.awaitTermination()
    assert(spark.sql("SELECT count(*) FROM graft.t").as[Long].head() === 19L)
  }

  test("Snapshots example: commit, time travel, CDF, vacuum") {
    import graft.lake.Snapshots
    val root = tmp("snap")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val df = spark.range(0, 10).select(col("id"), lit(1995).as("year"))
    val df2 = spark.range(5, 15).select(col("id"), lit(1995).as("year"))
    val df3 = spark.range(20, 25).select(col("id"), lit(1995).as("year"))

    // --- docs/API.md: Snapshots ---
    val v1 = Snapshots.commit(df, root, "t", Seq("year"))   // returns version
    val v2 = Snapshots.commit(df2, root, "t", Seq("year"))
    val v3 = Snapshots.append(df3, root, "t", Seq("year"))  // pure append:
                                                            // replaces nothing
    val asOf = Snapshots.readVersion(spark, root, "t", v1)  // time travel
    val cdf  = Snapshots.diff(spark, root, "t", v1, v2)     // insert/delete rows
    assert(asOf.count() === 10)   // (materialize before vacuum drops v1)
    assert(cdf.filter(col("change_type").isin("insert", "delete")).count() > 0)
    // append carried v2 forward even though df3 touches year=1995
    assert(Snapshots.readVersion(spark, root, "t", v3).count() === 15)
    Snapshots.vacuum(spark, root, "t", keepVersions = 1, graceMillis = 0L)
    // --- end ---

    assert(Snapshots.readVersion(spark, root, "t", v3).count() === 15)

    // --- docs/API.md: Snapshots stats skipping ---
    import spark.implicits._
    val s1 = Snapshots.commit(df.repartitionByRange(8, $"id"), root, "u",
      Seq.empty, statsCols = Seq("id"))
    val pruned = Snapshots.readVersionPruned(spark, root, "u", s1, "id",
      lit(10), lit(20))                                     // opens only files
                                                            // whose range hits
    Snapshots.compact(spark, root, "u", Seq.empty, numFiles = 4,
      clusterCols = Seq("id"), statsCols = Seq("id"))
    // --- end ---
    assert(pruned.count() === 0) // ids are 0..9 — every file pruned or filtered

    // --- docs/API.md: Snapshots deleteWhere ---
    val d1 = Snapshots.deleteWhere(spark, root, "t", $"id" % 5 === 0)
    // prior versions untouched; the new version reads minus the matches
    // --- end ---
    assert(Snapshots.readVersion(spark, root, "t", d1)
      .filter($"id" % 5 === 0).count() === 0)
    assert(Snapshots.readVersion(spark, root, "t", d1 - 1).count() === 15)

    // --- docs/API.md: Snapshots z-order compact + rectangle read ---
    val grid = spark.range(0, 4096).select((col("id") % 64).as("x"),
      expr("id div 64").as("y"))
    Snapshots.commit(grid, root, "g", Seq.empty, statsCols = Seq("x", "y"))
    val z = Snapshots.compact(spark, root, "g", Seq.empty, numFiles = 16,
      clusterCols = Seq("x", "y"), statsCols = Seq("x", "y"), zOrder = true)
    val rect = Snapshots.readVersionRect(spark, root, "g", z, Seq(
      ("x", lit(0), lit(63)), ("y", lit(10), lit(14))))
    // --- end ---
    assert(rect.count() === 64L * 5)
  }

  test("Packing/Contamination example") {
    import graft.operators.{Packing, Contamination}
    val docs2 = docs.withColumn("n_tokens",
      size(graft.text.TextFunctions.tokens(col("text"))).cast("long"))
    val evalSet = docs.filter(col("doc_id") % 50 === 0)

    // --- docs/API.md: Packing / Contamination ---
    val packed = Packing.packByBudget(docs2, "n_tokens",
      orderCols = Seq("doc_id"), budget = 2048L)     // contiguous context packs
    val contam = Contamination.report(docs, evalSet, "text", "doc_id", k = 8)
    // --- end ---

    assert(packed.groupBy(col("pack_id")).agg(sum(col("n_tokens")).as("s"))
      .filter(col("s") > 2048L + 400L).count() === 0) // budget + one doc slack
    assert(contam.count() > 0)
  }

  test("Decontamination example: buildIndex once, probe batches") {
    val root = "/tmp/graft_apidoc_decontam"
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("id"), col("text"))
    val evalEmb = emb
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") % 50 === 0)
    val centroids = emb.filter(col("vec_id") % 100 === 50)
      .select(col("vec_id").cast("long").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))
    val batchDocs = docs.filter(col("doc_id") % 50 =!= 0 && col("doc_id") < 100)
      .select(col("doc_id").as("id"), col("text"))
    val batchEmb = emb
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") % 50 =!= 0 && col("vec_id") < 100)

    // --- docs/API.md: Decontamination — train-vs-eval at probe cost ---
    import graft.operators.Decontamination

    Decontamination.buildIndex(evalDocs, "text", "id", k = 8,
      evalEmb, centroids, root)                       // once, persisted
    val verdicts = Decontamination.probe(spark, batchDocs, "text", "id",
      k = 8, batchEmb, root, tau = 0.9)
    // (id, n_overlap, ngram_hit, n_sem, sem_hit, contaminated)
    // --- end ---

    assert(verdicts.columns.toSeq === Seq("id", "n_overlap", "ngram_hit",
      "n_sem", "sem_hit", "contaminated"))
    assert(verdicts.count() === batchDocs.count())
  }

  test("ImportanceResampling example: weights, score, select") {
    val targetDocs = docs.filter(col("source") === "src0")
      .select(col("doc_id").as("id"), col("text"))
    val rawDocs = docs.filter(col("source") =!= "src0")
      .select(col("doc_id").as("id"), col("text"))

    // --- docs/API.md: Importance resampling — DSIR data selection ---
    import graft.operators.ImportanceResampling

    val w = ImportanceResampling.weights(targetDocs, rawDocs, "text")
    val scored = ImportanceResampling.score(rawDocs, "text", "id", w)
    val kept = ImportanceResampling.select(scored, fraction = 0.2)
    // (id, n_tokens, score_micro)
    // --- end ---

    assert(kept.columns.toSeq === Seq("id", "n_tokens", "score_micro"))
    val n = scored.count()
    assert(kept.count() === math.ceil(n * 0.2).toLong)
  }

  test("Multimodal example: features, pixel stats, audio, resize") {
    import graft.multimodal.Multimodal
    val media = docs.limit(30).select(
      col("doc_id").as("media_id"),
      Multimodal.syntheticBmpPattern(col("doc_id"),
        (lit(2) + col("doc_id") % 5).cast("int"),
        (lit(2) + col("doc_id") % 4).cast("int")).as("payload"))
    val audio = docs.limit(30).select(
      col("doc_id").as("media_id"),
      Multimodal.syntheticWavPattern(col("doc_id"),
        (lit(300) + col("doc_id") % 100).cast("int")).as("payload"))

    // --- docs/API.md: Multimodal ---
    val feats  = Multimodal.extractFeatures(media)          // batched per partition
    val pixels = Multimodal.pixelStats(media)               // decode + stats per image
    val rms    = Multimodal.audioFeatures(audio, frameSize = 256)
    val small  = Multimodal.resizePixels(media, ow = 8, oh = 8)
    // --- end ---

    assert(feats.count() === 30)
    assert(pixels.filter(col("format") === "bmp").count() === 30)
    assert(rms.count() > 0 && small.count() === 30L * 8 * 8) // one row per output pixel
  }

  test("Boilerplate example: frequent-segment dictionary + removal") {
    // --- docs/API.md: Boilerplate ---
    import graft.text.Boilerplate

    val clean = Boilerplate.removeFrequentSegments(docs, "text", "doc_id",
      segWords = 10, minDocs = 3) // (id, n_segments, n_removed, clean_text)
    val dict  = Boilerplate.frequentSegments(docs, "text", "doc_id", 10, 3)
    // --- end ---

    assert(clean.count() === docs.count())
    assert(clean.columns.toSeq ===
      Seq("id", "n_segments", "n_removed", "clean_text"))
    assert(dict.columns.toSeq === Seq("seg", "n_docs"))
  }

  test("RecordLinkage example: block + levenshtein + argmin") {
    val s = spark; import s.implicits._
    val reference = Seq((100L, "acme corp 0017"), (101L, "zen labs 0018"))
      .toDF("rid", "rname")
    val dirty = Seq((1L, "acme c0rp 0017"), (2L, "zen labz 0018"))
      .toDF("pid", "pname")

    // --- docs/API.md: RecordLinkage ---
    import graft.operators.RecordLinkage

    val linked = RecordLinkage.link(dirty, reference,
      probeId = "pid", probeName = "pname", refId = "rid", refName = "rname",
      blockKey = c => substring(c, -4, 4), maxDistance = 2)
    // --- end ---

    val m = linked.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 100L, 2L -> 101L))
  }

  test("Trend example: per-group OLS over integer moments") {
    val li = graft.queries.Tables.lineitem(spark, dir)
      .withColumn("g", (col("l_partkey") % 10).cast("int"))

    // --- docs/API.md: Trend ---
    import graft.operators.Trend

    val trends = Trend.ols(li, Seq("g"),
      x = datediff(col("l_shipdate").cast("date"), lit("1995-06-01").cast("date")),
      y = round(col("l_quantity") * 100).cast("long"))
    // --- end ---

    assert(trends.count() === 10)
    assert(trends.columns.toSeq ===
      Seq("g", "n", "slope", "intercept", "corr"))
  }

  test("SemDedup example: cluster then prune tau-similar neighbors") {
    // --- docs/API.md: SemDedup ---
    import graft.operators.{SemDedup, Similarity}

    val cents   = Similarity.ivfCentroids(emb, nlist = 16)
    val verdict = SemDedup.dedup(emb, cents, tau = 0.95)
    val kept    = emb.join(verdict.filter(col("kept") === 1), "vec_id")
    // --- end ---

    assert(verdict.count() === emb.count())
    assert(verdict.columns.toSeq ===
      Seq("vec_id", "cell", "n_dup_lower", "kept"))
    assert(kept.count() > 0)
  }

  test("UrlNormalize example: canonical URLs + per-host rollup") {
    val pages = docs.select(col("doc_id"),
      concat(lit("HTTPS://Host"), (col("doc_id") % 3).cast("string"),
        lit(".Com:443/p/"), col("doc_id").cast("string"),
        lit("/?utm_source=x&a=1")).as("url"))

    // --- docs/API.md: UrlNormalize ---
    import graft.text.UrlNormalize

    val canon = pages.select(
      UrlNormalize.canonicalUrl(col("url")).as("url_c"),
      UrlNormalize.host(col("url")).as("host"))
    val perHost = canon.groupBy("host").agg(countDistinct("url_c").as("n_pages"))
    // --- end ---

    assert(perHost.count() === 3)
    assert(canon.filter(col("url_c").contains("utm_")).count() === 0)
    assert(canon.filter(col("url_c").startsWith("https://host")).count() === canon.count())
  }

  test("FileStats example: write with manifest, pruned range read") {
    val s = spark; import s.implicits._
    val path = tmp("filestats")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    val df = spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))

    // --- docs/API.md: FileStats ---
    import graft.lake.FileStats

    FileStats.writeWithStats(df, path, "k", numFiles = 64)
    val hits = FileStats.readRange(spark, path, "k", lit(100L), lit(199L))
    val opened = FileStats.candidateFiles(spark, path, lit(100L), lit(199L))
    // --- end ---

    assert(hits.count() === 100)
    assert(opened.size < FileStats.totalFiles(spark, path))
  }

  test("ZOrder example: clustered write, pruned rectangle read") {
    val s = spark; import s.implicits._
    val path = tmp("zorder_api")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    val df = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")

    // --- docs/API.md: ZOrder rectangle read ---
    import graft.lake.ZOrder

    ZOrder.writeClustered(df, path, "x", "y", partitions = 16)
    val hits   = ZOrder.readRectangle(spark, path, "x", "y",
      lit(10L), lit(20L), lit(40L), lit(50L))
    val opened = ZOrder.candidateFiles(spark, path,
      lit(10L), lit(20L), lit(40L), lit(50L))
    // --- end ---

    assert(hits.count() === 11L * 11L)
    assert(opened.size < ZOrder.totalFiles(spark, path))
  }

  test("BloomSkip example: bloom-pruned point lookup") {
    val s = spark; import s.implicits._
    val path = tmp("bloomskip_api")
    val df = (0 until 2000).map(i => (i.toLong, i % 7)).toDF("k", "grp")
    val keys = Seq(13L, 977L).toDF("k")

    // --- docs/API.md: BloomSkip point lookup ---
    import graft.lake.BloomSkip

    BloomSkip.writeWithBloom(df, path, "k", numFiles = 16)
    val rows   = BloomSkip.readPoints(spark, path, "k", keys)
    val opened = BloomSkip.candidateFiles(spark, path, keys)
    // --- end ---

    assert(rows.select("k").as[Long].collect().toSet === Set(13L, 977L))
    assert(opened.size < BloomSkip.totalFiles(spark, path))
  }

  test("Profiling + PageRank examples") {
    val orders = graft.queries.Tables.orders(spark, dir)
    val edges = orders.select(col("o_custkey").as("src"),
      (col("o_orderkey") % 50).as("dst"))

    // --- docs/API.md: Analytics (Profiling, PageRank) ---
    import graft.operators.{Profiling, PageRank}

    val report = Profiling.profile(orders, Seq("o_orderkey", "o_totalprice"))
    val ranks  = PageRank.run(edges, "src", "dst", iters = 3) // (node, rank_micro)
    // --- end ---

    assert(report.count() === 2)
    assert(ranks.columns.toSeq === Seq("node", "rank_micro"))
    assert(ranks.agg(min(col("rank_micro"))).head().getLong(0) > 0)
  }

  test("HybridSearch example: reciprocal-rank fusion") {
    val s = spark; import s.implicits._
    val bm25Top = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val annTop = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")

    // --- docs/API.md: HybridSearch ---
    import graft.text.HybridSearch

    val fused = HybridSearch.rrf(Seq(bm25Top, annTop), "id", "rank", k = 60)
    // --- end ---

    assert(fused.orderBy("rank").select("id").as[Long].collect().head === 2L)
    assert(fused.columns.toSeq === Seq("id", "rrf_micro", "n_lists", "rank"))
  }

  test("InvertedIndex example: build, phrase, AND") {
    // --- docs/API.md: InvertedIndex ---
    import graft.text.InvertedIndex

    val idx     = InvertedIndex.build(docs, "text", "doc_id")
    val hits    = InvertedIndex.phraseSearch(idx, Seq("risk", "factors"))
    val allOf   = InvertedIndex.allTerms(idx, Seq("risk", "liquidity"))
    // --- end ---

    assert(idx.columns.toSeq === Seq("term", "id", "pos"))
    assert(hits.columns.toSeq === Seq("id", "n_matches"))
    assert(allOf.columns.toSeq === Seq("id"))
  }

  test("Hll + CorrMatrix examples: mergeable sketches, one-pass corr") {
    val events = graft.queries.Tables.events(spark, dir)
    val li = graft.queries.Tables.lineitem(spark, dir)

    // --- docs/API.md: Analytics (Hll, CorrMatrix) ---
    import graft.operators.{Hll, CorrMatrix}

    val daily  = Hll.build(events, Seq("event_type"), "user_id")
    val folded = daily.groupBy("event_type")
      .agg(reduce(collect_list("registers"),
        array_repeat(lit(0), 64), (a, b) => Hll.merge(a, b)).as("registers"))
    val est    = folded.select(col("event_type"),
      Hll.estimateMicro(col("registers")).as("est_micro"))
    val corr   = CorrMatrix.pearson(li, Seq(
      "qty" -> round(col("l_quantity") * 100),
      "price" -> round(col("l_extendedprice") * 100)))
    // --- end ---

    assert(est.count() === daily.count())
    assert(est.agg(min(col("est_micro"))).head().getLong(0) > 0)
    val c = corr.collect()
    assert(c.length === 1 && c.head.getString(0) === "qty")

    // --- docs/API.md: Analytics (Hll.pairwiseSetEstimates) ---
    val overlap = Hll.pairwiseSetEstimates(daily, "event_type")
    // (ga, gb, est_a_micro, est_b_micro, est_union_micro, est_intersect_micro)
    // --- end ---
    assert(overlap.count() > 0)
    assert(overlap.columns.contains("est_intersect_micro"))
  }

  test("Triangles + CoOccurrence + FeatureSelection examples") {
    val li = graft.queries.Tables.lineitem(spark, dir)
    val docs = graft.queries.Tables.documents(spark, dir)

    // --- docs/API.md: Graph / association mining ---
    import graft.operators.{Triangles, CoOccurrence}
    import graft.text.FeatureSelection

    val copurchase = CoOccurrence.pairCounts(li, "l_orderkey", "l_partkey")
    val triCounts  = Triangles.perNode(copurchase, "x", "y") // (node, triangles)
    val rules      = CoOccurrence.rules(li, "l_orderkey", "l_partkey",
      minSupport = 2L)                         // support, confidence, lift
    val feats      = FeatureSelection.chiSquareTokens(
      docs.withColumn("toks", split(col("text"), " "))
        .withColumn("lab", col("lang") === "en"),
      "doc_id", "toks", "lab", minDocs = 5L)   // (token, a, b, c, d, chi2_micro)
    // --- end ---

    assert(copurchase.columns.toSeq === Seq("x", "y", "support"))
    assert(triCounts.columns.toSeq === Seq("node", "triangles"))
    assert(rules.count() > 0)
    assert(feats.count() > 0 &&
      feats.columns.contains("chi2_micro"))

    val events = graft.queries.Tables.events(spark, dir)
    val dailyCounts = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        (col("cnt") * 1000).as("v_milli"))

    // --- docs/API.md: Graph / association mining (KCore, ChangePoint) ---
    import graft.operators.{KCore, ChangePoint}

    val core  = KCore.peel(copurchase, "x", "y", k = 20, rounds = 4)
    val drift = ChangePoint.cusum(dailyCounts, Seq("event_type"), "day",
      "v_milli", sigmaMult = 3.0) // + (k_milli, s_pos/neg_milli, flag_pos/neg)
    // --- end ---

    assert(core.columns.toSeq === Seq("n", "degree"))
    assert(drift.count() === dailyCounts.count())
    assert(drift.columns.contains("s_pos_milli"))
  }

  test("AsOfJoin example: backward / forward / nearest") {
    val ev = graft.queries.Tables.events(spark, dir)
    val trades = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("sid"), col("ts_ns").as("t"))
    val quotes = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("sid"), col("ts_ns").as("qt"),
        col("value").as("bid"))

    // --- docs/API.md: AsOfJoin — the full polars strategy family ---
    import graft.operators.AsOfJoin

    val lastQ = AsOfJoin.backward(trades, quotes, Seq("sid"), "t", "qt",
      rightCols = Seq("bid"))                       // latest quote at/before
    val nextQ = AsOfJoin.forward(trades, quotes, Seq("sid"), "t", "qt",
      rightCols = Seq("bid"))                       // first quote at/after
    val nearQ = AsOfJoin.nearest(trades, quotes, Seq("sid"), "t", "qt",
      rightCols = Seq("bid"), tolerance = Some(lit(60_000_000L)))
    // --- end ---

    val n = trades.count()
    assert(lastQ.count() === n && nextQ.count() === n && nearQ.count() === n)
    assert(Seq(lastQ, nextQ, nearQ).forall(_.columns.contains("bid")))

    val purchases2 = trades.withColumnRenamed("sid", "user_id")
      .withColumnRenamed("t", "t")
    val views = quotes.withColumnRenamed("sid", "user_id")
      .withColumnRenamed("qt", "vt")
      .withColumn("cents", round(col("bid") * 100).cast("long"))

    // --- docs/API.md: RangeAgg — trailing-window aggregate join ---
    import graft.operators.RangeAgg

    val spend = RangeAgg.trailingSum(purchases2, views, Seq("user_id"),
      "t", "vt", "cents", windowSize = lit(3L * 86400 * 1000000000L))
    // + (trail_sum, trail_cnt), zeros when the window is empty
    // --- end ---

    assert(spend.count() === purchases2.count())
    assert(spend.columns.contains("trail_sum") &&
      spend.columns.contains("trail_cnt"))
  }

  test("SetSimilarityJoin example: prefix-filtered exact Jaccard") {
    val docs = graft.queries.Tables.documents(spark, dir)
      .limit(60) // dimension-sized doc sample for the doc example

    // --- docs/API.md: Dedup (SetSimilarityJoin) ---
    import graft.operators.SetSimilarityJoin

    val dup = SetSimilarityJoin.selfJoin(docs, "text", "doc_id",
      thresholdMicro = 800000L) // (id_a, id_b, shared, n_a, n_b, jaccard_micro)
    // --- end ---

    assert(dup.columns.toSeq ===
      Seq("id_a", "id_b", "shared", "n_a", "n_b", "jaccard_micro"))
    dup.count() // executes the full pipeline
  }

  test("Indicators example: drawdown / ewma / bollinger / rsi") {
    val px = graft.queries.Tables.events(spark, dir)
      .select(col("user_id").as("sid"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))

    // --- docs/API.md: Indicators — per-security technical indicators ---
    import graft.ticks.Indicators

    val dd    = Indicators.drawdownSummary(px, "sid", "ts", "cents")
    // + (max_dd_cents, peak_cents, n_new_peaks, n_obs) per sid
    val ewma  = Indicators.ewmaDyadic(px, "sid", "ts", "cents", window = 8)
    // + exact (ewma_num, ewma_den) and the one-division `ewma`
    val bands = Indicators.bollingerBreach(px, "sid", "ts", "cents",
      window = 20, k = 2)                  // + breach_up/dn, null until full
    val mom   = Indicators.rsi(px, "sid", "ts", "cents", window = 14)
    // + (gain_cents, loss_cents, rsi)
    // --- end ---

    val n = px.count()
    assert(dd.count() === px.select("sid").distinct().count())
    assert(ewma.count() === n && bands.count() === n && mom.count() === n)
    assert(dd.columns.contains("max_dd_cents") &&
      ewma.columns.contains("ewma") &&
      bands.columns.contains("breach_up") && mom.columns.contains("rsi"))
  }

  test("Pca example: fitMilli + project") {
    // --- docs/API.md: Pca — exact-integer principal components ---
    import graft.operators.Pca

    val loadings = Pca.fitMilli(emb, "embedding", dims = 64, rounds = 3)
    // (dim, loading_milli) with max |loading| = 1000, sign pinned by v0
    val w = loadings.orderBy("dim").select("loading_milli")
      .collect().map(_.getLong(0))       // dimension-sized (64)
    val scores = Pca.project(emb, "embedding", "vec_id", w)
    // (vec_id, score) — exact integer projection, no shuffle
    // --- end ---

    assert(w.length === 64 && w.map(math.abs).max === 1000L)
    assert(scores.count() === emb.count())
    assert(scores.columns.toSeq === Seq("vec_id", "score"))
  }

  test("DeleteVectors example: writeBase / appendDeletes / readMerged / compact") {
    val s = spark; import s.implicits._
    val root = tmp("dv")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val df = (1L to 20L).map(i => (i, i * 10)).toDF("k", "v")
    val staleKeys = Seq(3L, 5L).toDF("k")

    // --- docs/API.md: DeleteVectors — merge-on-read row-level deletes ---
    import graft.lake.DeleteVectors

    DeleteVectors.writeBase(df, root, "orders")
    DeleteVectors.appendDeletes(staleKeys, root, "orders")   // keys only
    val live = DeleteVectors.readMerged(spark, root, "orders", Seq("k"))
    // --- end ---
    assert(live.count() === 18)
    // --- docs/API.md (cont.) ---
    DeleteVectors.compact(spark, root, "orders", Seq("k"))   // fold + clear
    // --- end ---
    assert(DeleteVectors.readMerged(spark, root, "orders", Seq("k")).count() === 18)
  }

  test("SchemaEvolution example: writeBatch / readAll") {
    val s = spark; import s.implicits._
    val root = tmp("se")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val v1df = Seq((1, 100)).toDF("cust", "bal")
    val v2df = Seq((2L, 200L, "AUTO")).toDF("cust", "bal", "segment")

    // --- docs/API.md: SchemaEvolution — additive schema changes ---
    import graft.lake.SchemaEvolution

    SchemaEvolution.writeBatch(v1df, root, "customers", batch = 0)
    SchemaEvolution.writeBatch(v2df, root, "customers", batch = 1) // +col, widened
    val all = SchemaEvolution.readAll(spark, root, "customers")
    // --- end ---

    assert(all.count() === 2)
    assert(all.schema("cust").dataType.typeName === "long")
    assert(all.columns.contains("segment") && all.columns.contains("_batch"))
  }

  test("Perceptual hashing example: ImageHash / AudioHash / HammingJoin") {
    val media = docs.select(col("doc_id").as("media_id"),
      graft.multimodal.Multimodal.syntheticBmpScramble(
        col("doc_id") % 13, lit(10), lit(9)).as("payload"))
    val clips = docs.select(col("doc_id").as("media_id"),
      graft.multimodal.Multimodal.syntheticWavScramble(
        col("doc_id") % 13, lit(2048)).as("payload"))

    // --- docs/API.md: Perceptual hashing — media-level near-dup ---
    import graft.multimodal.{ImageHash, AudioHash}
    import graft.operators.HammingJoin

    val imgPairs = ImageHash.nearDuplicates(media, maxDist = 2)
    val sndPairs = AudioHash.nearDuplicates(clips, maxDist = 2)
    // --- end ---
    val hashes = ImageHash.dhash(media).withColumnRenamed("dhash", "h")
      .withColumnRenamed("media_id", "id")
    // --- docs/API.md (cont.) ---
    val pairs = HammingJoin.selfPairs(hashes, "id", "h",
      bits = 63, bands = 4, maxDist = 2) // (id_a, id_b, h_a, h_b, dist)
    // --- end ---

    // %13 folding plants exact clones → dist-0 pairs must exist
    assert(imgPairs.filter(col("dist") === 0).count() > 0)
    assert(sndPairs.filter(col("dist") === 0).count() > 0)
    assert(pairs.columns.toSeq ===
      Seq("id_a", "id_b", "h_a", "h_b", "dist"))

    val videos = docs.limit(40).select(col("doc_id").as("media_id"),
      graft.multimodal.Multimodal.syntheticAviScramble(
        col("doc_id") % 7, lit(10), lit(9), lit(4),
        col("doc_id") % 2).as("payload"))
    // --- docs/API.md: VideoHash temporal near-dup ---
    import graft.multimodal.VideoHash

    val frames = VideoHash.frameHashes(videos)       // (media_id, f, dhash)
    val vids = VideoHash.nearDuplicates(videos,
      maxDist = 2, maxOffset = 2, minMatch = 2)      // (id_a, id_b, offset, matched)
    // --- end ---
    assert(frames.columns.toSeq === Seq("media_id", "f", "dhash"))
    assert(vids.columns.toSeq === Seq("id_a", "id_b", "offset", "matched"))
    // %7 seed folding plants clones (phase 0 vs 1) → aligned pairs exist
    assert(vids.count() > 0)
  }

  test("Risk / Backtest example: historicalVar + momentumTopK") {
    val px2 = graft.queries.Tables.events(spark, dir)
      .groupBy(col("user_id").as("sid"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(round(max_by(col("value"), col("ts")) * 100).cast("long").as("cents"))

    // --- docs/API.md: Risk / Backtest — portfolio analytics ---
    import graft.ticks.{Risk, Backtest}

    val var95 = Risk.historicalVar(px2, "sid", "day", "cents",
      alphaNum = 5, alphaDen = 100)
    // (sid, n_deltas, var_cents, es_sum_cents, es_n)
    val curve = Backtest.momentumTopK(px2, "sid", "day", "cents",
      lookback = 5, k = 10)
    // (day, n_selected, pnl_cents, best_cents, worst_cents)
    val ls = Backtest.longShortTopK(px2, "sid", "day", "cents",
      lookback = 5, k = 10)
    // + (n_long, n_short, spread_cents, cum_spread_cents)
    // --- end ---
    val px = graft.queries.Tables.events(spark, dir).select(
      col("user_id").as("sid"), col("ts"),
      round(col("value") * 100).cast("long").as("cents"))
    // --- docs/API.md (cont.) ---
    import graft.ticks.Indicators
    val jump = Indicators.realizedVol(px, "sid", "ts", "cents",
      bucket = date_format(col("ts"), "yyyy-MM-dd"))
    // + (n_ret, rv, bv, bv_ratio_micro) — low BV/RV flags jump days
    // --- end ---

    assert(var95.columns.toSeq ===
      Seq("sid", "n_deltas", "var_cents", "es_sum_cents", "es_n"))
    assert(curve.columns.toSeq ===
      Seq("day", "n_selected", "pnl_cents", "best_cents", "worst_cents"))
    assert(ls.columns.contains("cum_spread_cents"))
    assert(jump.columns.toSeq ===
      Seq("sid", "bucket", "n_ret", "rv", "bv", "bv_ratio_micro"))
    assert(var95.count() > 0 && curve.count() > 0 && ls.count() > 0)
  }

  test("TextRank example: keywords") {
    // --- docs/API.md: TextRank — graph keyword extraction ---
    import graft.text.TextRank

    val kws = TextRank.keywords(docs, "text", "doc_id",
      window = 2, iters = 3, topK = 20) // (token, rank_micro)
    // --- end ---

    val rows = kws.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(kws.columns.toSeq === Seq("token", "rank_micro"))
  }

  test("JoinIvm example: maintain + deltaJoin") {
    val s = spark; import s.implicits._
    val aOld = Seq((1L, 10L)).toDF("k", "av")
    val aDelta = Seq((2L, 20L)).toDF("k", "av")
    val bOld = Seq((1L, "x"), (2L, "y")).toDF("k", "bv")
    val bDelta = Seq((1L, "x2")).toDF("k", "bv")
    val jOld = aOld.join(bOld, Seq("k"))

    // --- docs/API.md: JoinIvm — incremental join maintenance ---
    import graft.operators.JoinIvm

    val jNew = JoinIvm.maintain(jOld, aOld, aDelta, bOld, bDelta, Seq("k"))
    val dJ   = JoinIvm.deltaJoin(aOld, aDelta, bOld, bDelta, Seq("k"))
    // --- end ---

    val full = aOld.unionByName(aDelta).join(bOld.unionByName(bDelta), Seq("k"))
    assert(jNew.count() === full.count())
    assert(dJ.count() === full.count() - jOld.count())
  }

  test("CorporateActions / Nbbo example: adjust + consolidate") {
    val s = spark; import s.implicits._
    val px2 = Seq(("A", "d1", 400L), ("A", "d2", 200L))
      .toDF("sid", "day", "cents")
    val actions = Seq(("A", "d2", 2L, 1L)).toDF("sid", "day", "num", "den")
    val quotes = Seq((1L, 10L, 1L, 0, 100L, 105L), (1L, 11L, 2L, 1, 101L, 104L))
      .toDF("sym", "ts", "qid", "venue", "bid", "ask")

    // --- docs/API.md: CorporateActions / Nbbo — market-structure ---
    import graft.ticks.{CorporateActions, Nbbo}

    val adj = CorporateActions.adjust(px2, actions, "sid", "day", "cents")
    // + (fnum, fden, adj_milli); actions = (sid, day, num, den) splits
    val tape = Nbbo.consolidate(quotes, "sym", Seq("ts", "qid"),
      "venue", "bid", "ask", nVenues = 4)
    // + (nbbo_bid, nbbo_ask, locked)
    // --- end ---

    val a = adj.select("day", "fnum", "fden", "adj_milli")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(a("d1") === (("d1", 1L, 2L, 200000L))) // pre-split halves
    assert(a("d2") === (("d2", 1L, 1L, 200000L)))
    val t = tape.select("qid", "nbbo_bid", "nbbo_ask", "locked")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(t(1) === ((2L, 101L, 104L, false)))
  }

  test("Microstructure / DataQuality example") {
    val trades = graft.queries.Tables.events(spark, dir).select(
      col("user_id").as("sym"), col("ts"),
      round(col("value") * 100).cast("long").as("px"),
      (col("event_id") % 13 + 1).as("sz"))
    val orders = graft.queries.Tables.orders(spark, dir)
    val sup = graft.queries.Tables.supplier(spark, dir)
      .join(graft.queries.Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.queries.Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))

    // --- docs/API.md: Microstructure — trade signing, flow, impact ---
    import graft.ticks.Microstructure

    val signed = Microstructure.tickSign(trades, "sym", Seq("ts"), "px")
    val flow = Microstructure.flowImbalance(trades, "sym", Seq("ts"),
      "px", "sz", bucket = date_format(col("ts"), "yyyy-MM-dd"))
    val impact = Microstructure.kyleLambda(trades, "sym", Seq("ts"), "px", "sz")
    // (sym, n, slope, intercept, corr) — slope is the lambda
    // --- end ---
    assert(signed.columns.contains("side") && flow.columns.contains("imbalance"))
    assert(impact.columns.toSeq === Seq("sym", "n", "slope", "intercept", "corr"))

    // --- docs/API.md: DataQuality — distribution audits ---
    import graft.operators.DataQuality

    val audit = DataQuality.benford(orders, round(col("o_totalprice") * 100))
    // 9 rows: (digit, obs, n, exp_micro, dev_micro)
    val conc = DataQuality.hhi(sup, Seq("r_name"),
      abs(round(col("s_acctbal") * 100))) // + (n, total, hhi_micro)
    // --- end ---
    assert(audit.count() === 9)
    assert(conc.columns.toSeq === Seq("r_name", "n", "total", "hhi_micro"))
  }
}

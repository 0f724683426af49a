package graft.operators

import graft.SparkTestBase
import graft.functions.MedianSkew
import graft.lake.Bucketing
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the unsalted join's rows") {
    val left = Seq.tabulate(1000)(i => (if (i < 900) "hot" else s"k$i", i))
      .toDF("key", "lv") // 90% of rows on one key
    val right = Seq(("hot", 1), ("k950", 2), ("other", 3)).toDF("key", "rv")
    val plain = left.join(right, "key").select("key", "lv", "rv")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedEquiJoin(left, right, "key", 8)
      .select("key", "lv", "rv").collect().map(_.toString).sorted
    assert(salted.toSeq === plain.toSeq)
    assert(salted.length === 901)
  }

  test("hot-key salted join ≡ plain join, under skew and without it") {
    val left = Seq.tabulate(1000)(i => (if (i < 900) "hot" else s"k$i", i))
      .toDF("key", "lv")
    val right = Seq(("hot", 1), ("k950", 2), ("other", 3)).toDF("key", "rv")
    val plain = left.join(right, "key").select("key", "lv", "rv")
      .collect().map(_.toString).sorted
    val targeted = SkewJoin.hotKeySaltedJoin(left, right, "key",
        saltFactor = 8, hotKeys = 2)
      .select("key", "lv", "rv").collect().map(_.toString).sorted
    assert(targeted.toSeq === plain.toSeq)

    // hotKeys larger than the distinct key count: everything salts, still ≡
    val uniform = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("key", "lv")
    val r2 = Seq(("a", 9), ("c", 8)).toDF("key", "rv")
    val all = SkewJoin.hotKeySaltedJoin(uniform, r2, "key", 4, hotKeys = 100)
      .select("key", "lv", "rv").collect().map(_.toString).sorted
    assert(all.toSeq === uniform.join(r2, "key").select("key", "lv", "rv")
      .collect().map(_.toString).sorted.toSeq)
  }

  test("MedianSkew aggregator matches the reference Pearson formula") {
    // values 1,2,3,4,100: mean=22, median=3, sample std≈43.56
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val got = df.agg(MedianSkew($"v").as("skew")).collect().head.getDouble(0)
    val mean = 22.0; val median = 3.0
    val std = math.sqrt(Seq(1.0, 2.0, 3.0, 4.0, 100.0)
      .map(v => (v - mean) * (v - mean)).sum / 4)
    assert(math.abs(got - (mean - median) / std) < 1e-12)
  }

  test("MedianSkew is reduction-order independent and null on degenerate groups") {
    val df = (1 to 200).map(_.toDouble).toDF("v").repartition(7)
    val a = df.agg(MedianSkew($"v")).collect().head.getDouble(0)
    val b = df.repartition(3).agg(MedianSkew($"v")).collect().head.getDouble(0)
    assert(a === b)
    val single = Seq(5.0).toDF("v").agg(MedianSkew($"v")).collect().head
    assert(single.isNullAt(0))
    val const = Seq(5.0, 5.0, 5.0).toDF("v").agg(MedianSkew($"v")).collect().head
    assert(const.isNullAt(0)) // zero stddev
  }

  test("bloom pre-filter + exact semi-join ≡ plain semi-join (false positives eliminated)") {
    val keys = (1 to 50).map(_ * 3L).toDF("k") // multiples of 3 only
    val facts = (1L to 500L).map(i => (i % 120, i)).toDF("k", "v")
    val bf = keys.stat.bloomFilter("k", 1000L, 0.03)
    val mightContain = udf((x: Long) => bf.mightContain(x))
    val pruned = facts.filter(mightContain($"k"))
      .join(broadcast(keys), Seq("k"), "left_semi")
    val plain = facts.join(keys, Seq("k"), "left_semi")
    assert(pruned.collect().map(_.toString).sorted.toSeq ===
      plain.collect().map(_.toString).sorted.toSeq)
    // and the bloom admits no false negatives: pre-filter keeps every match
    assert(facts.filter(mightContain($"k")).count() >= plain.count())
  }

  test("hash split is deterministic and partitions the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = graft.queries.ScaleQueries.q60HashSplit(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    val b = graft.queries.ScaleQueries.q60HashSplit(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b) // stable across runs/plans (md5, not RNG)
    val counts = graft.queries.ScaleQueries.q60HashSplit(spark, "/root/testdata/sf0.001")
      .select($"split", $"n_docs").as[(String, Long)].collect().toMap
    assert(counts.values.sum === docs.count()) // a partition, not a sample
    assert(counts.keySet === Set("train", "valid", "test"))
    // 80/10/10 within loose tolerance on a small corpus
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.6 && counts("train") / total < 0.95)
  }

  test("packing: contiguous packs, budget+1-doc bound, corpus preserved") {
    val docs = (1L to 500L).map(i => (i, 50 + (i % 37) * 10)).toDF("doc_id", "n_tokens")
    val budget = 1000L
    val packed = Packing.packByBudget(docs, "n_tokens", Seq("doc_id"), budget)
      .select($"doc_id", $"n_tokens", $"pack_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.length === 500) // no row lost/duplicated
    // packs are contiguous runs in doc order
    assert(packed.map(_._3).toSeq === packed.map(_._3).sorted.toSeq)
    // every pack except possibly the last stays under budget + one doc
    val byPack = packed.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    byPack.foreach { case (pid, tot) =>
      val maxDoc = packed.filter(_._3 == pid).map(_._2).max
      assert(tot <= budget + maxDoc, s"pack $pid overflows: $tot")
    }
    // determinism across partitionings
    val again = Packing.packByBudget(docs.repartition(13), "n_tokens",
      Seq("doc_id"), budget)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.map(_._2).toSeq === packed.map(_._3).toSeq)
  }

  test("morton code matches a reference bit-interleave; clustered write partitions the z-range") {
    def refMorton(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val got = pts.toDF("x", "y")
      .select(graft.lake.ZOrder.mortonCode($"x", $"y").as("z"))
      .as[Long].collect().toSeq
    assert(got === pts.map { case (x, y) => refMorton(x, y) })

    val d = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"
    val df = (0L until 4096L).map(i => (i % 64, i / 64, i)).toDF("x", "y", "v")
    graft.lake.ZOrder.writeClustered(df, d, "x", "y", partitions = 8)
    val back = spark.read.parquet(d)
    assert(back.count() === 4096) // round trip
    // per-file z-ranges are disjoint (range partition on the code) — the
    // property row-group min/max pruning on BOTH dims derives from
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val ranges = back
      .withColumn("z", graft.lake.ZOrder.mortonCode($"x", $"y"))
      .groupBy(input_file_name().as("f"))
      .agg(fmin($"z").as("lo"), fmax($"z").as("hi"))
      .orderBy($"lo")
      .select($"lo", $"hi").as[(Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("q59 bloom probe is the native codegen'd expression, not a ScalaUDF") {
    val df = graft.queries.ScaleQueries.q59BloomPrune(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    assert(plan.toLowerCase.contains("might_contain"), plan)
    // probe ≡ exact semi-join alone (bloom admits FPs only)
    val exact = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
          .filter($"c_nationkey" === 1).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy(date_format($"o_orderdate", "yyyy-MM")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("q67 reads events once: every consumer branch hits the cached days set") {
    val df = graft.queries.ScaleQueries.q67CoverageReport(spark, "/root/testdata/sf0.001")
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    // the distinct (user, day) base is MATERIALIZED (eager localCheckpoint)
    // before the query plan is built, so all three consumers (spine bounds,
    // per-user spans, observed days) must read the checkpointed RDD leaf —
    // and the events parquet must not appear in this plan AT ALL (its one
    // scan happened in the materialization job)
    val leafReads = "Scan ExistingRDD".r.findAllIn(plan).length
    assert(leafReads >= 3, s"expected >=3 materialized-leaf reads:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"events re-scanned instead of reading the materialized base:\n$plan")
  }

  test("stratified sample is seed-deterministic with in-tolerance fractions") {
    val q = graft.queries.ScaleQueries.q74SampleBySeedPinned _
    val a = q(spark, "/root/testdata/sf0.01").collect().map(_.toString).sorted.toSeq
    val b = q(spark, "/root/testdata/sf0.01").collect().map(_.toString).sorted.toSeq
    assert(a === b) // pinned seed ⇒ reproducible sample
    val got = q(spark, "/root/testdata/sf0.01")
      .select($"event_type", $"n_sampled").as[(String, Long)].collect().toMap
    val totals = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    val want = Map("click" -> 0.2, "view" -> 0.2, "purchase" -> 0.05,
      "signup" -> 0.05, "error" -> 0.05)
    want.foreach { case (t, f) =>
      val ratio = got.getOrElse(t, 0L).toDouble / totals(t)
      assert(math.abs(ratio - f) < 0.05, s"$t: $ratio vs $f")
    }
  }

  test("bucketed join on matching bucket counts plans without Exchange") {
    // warehouse.dir is a static conf — the default ./spark-warehouse is used
    // (gitignored); tables are dropped in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4)
      Bucketing.writeBucketed(l, "b_lineitem", "o_orderkey", 4)
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() ===
        o.join(l, "o_orderkey").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}

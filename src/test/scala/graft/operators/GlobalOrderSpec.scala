package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("runningSum matches the single-partition-window reference on shuffled input") {
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((1 to 500).toList).map(k => (k, rnd.nextInt(10).toLong))
    val df = rows.toDF("k", "v").repartition(13)
    val got = GlobalOrder.runningSum(df, Seq("k"), col("v"), "run")
      .select("k", "run").as[(Int, Long)].collect().toMap
    val want = rows.sortBy(_._1).scanLeft((0, 0L)) {
      case ((_, acc), (k, v)) => (k, acc + v)
    }.tail.toMap
    assert(got === want)
  }

  test("runningRowNumber is a dense 1..N numbering in key order") {
    val df = (1 to 100).map(i => (s"id${100 - i}", i)).toDF("name", "x").repartition(9)
    val got = GlobalOrder.runningRowNumber(df, Seq("name"), "rn")
      .orderBy("name").select("rn").as[Long].collect()
    assert(got.toSeq === (1L to 100L))
  }

  test("runningSum output columns = input columns + out; no single-partition window in plan") {
    val df = Seq((1, 2L), (3, 4L)).toDF("k", "v")
    val out = GlobalOrder.runningSum(df, Seq("k"), col("v"), "run")
    assert(out.columns.toSeq === Seq("k", "v", "run"))
    // the only windows in the plan must be partitioned (by __pid)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(ORDER"),
      "found an unpartitioned window:\n" + plan)
  }

  test("runningSum agrees with Window.orderBy on a dimension-sized relation") {
    val df = (1 to 200).map(i => (i % 50, i)).map { case (g, i) => (f"g$g%02d-$i%03d", i.toLong) }
      .toDF("key", "v").repartition(7)
    val viaWindow = df.withColumn("run",
      sum(col("v")).over(Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)))
      .select("key", "run").as[(String, Long)].collect().toMap
    val viaGlobal = GlobalOrder.runningSum(df, Seq("key"), col("v"), "run")
      .select("key", "run").as[(String, Long)].collect().toMap
    assert(viaGlobal === viaWindow)
  }

  test("spread is a no-op when the scan is already wide; spreadBy widens narrow inputs") {
    val narrow = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "t").coalesce(1)
    assert(narrow.rdd.getNumPartitions === 1)
    val widened = Parallelism.spreadBy(narrow, col("id"))
    assert(widened.rdd.getNumPartitions ===
      spark.sessionState.conf.numShufflePartitions)
    assert(widened.orderBy("id").as[(Int, String)].collect().toSeq ===
      Seq((1, "a"), (2, "b"), (3, "c")))

    val wide = spark.range(100).toDF("id")
      .repartition(spark.sessionState.conf.numShufflePartitions + 2)
    val same = Parallelism.spread(wide)
    assert(same.rdd.getNumPartitions === wide.rdd.getNumPartitions)
  }
}

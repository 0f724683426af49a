package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] = (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => flatten(q.plan)
    case other => other.children.flatMap(flatten)
  }) :+ p

  test("matches the window row_number formulation exactly") {
    val df = (1L to 10000L).map(i => (i % 97, i, (i * 7919 % 1000) / 10.0))
      .toDF("key", "id", "score").repartition(11)
    val got = TopKPerKey(df, 5, Seq("key"), Seq(("score", false), ("id", true)))
      .select($"key", $"id").as[(Long, Long)].collect().sorted.toSeq
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id".asc)
    val expect = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"key", $"id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === expect)
  }

  test("plans as partial + final exec around one exchange, with no sort") {
    val df = (1L to 1000L).map(i => (i % 7, i)).toDF("key", "v")
    val topk = TopKPerKey(df, 2, Seq("key"), Seq(("v", true)))
    topk.collect()
    val plan = flatten(topk.queryExecution.executedPlan)
    val execs = plan.collect { case t: TopKPerKeyExec => t }
    assert(execs.map(_.partial).sorted === Seq(false, true)) // final + partial
    assert(plan.count(_.getClass.getSimpleName.contains("ShuffleExchange")) === 1)
    assert(!plan.exists(_.getClass.getSimpleName == "SortExec"))
  }

  test("result is invariant to input partitioning (partial pass is correct)") {
    val base = (1L to 5000L).map(i => (i % 13, i)).toDF("key", "v")
    val a = TopKPerKey(base.repartition(3), 4, Seq("key"), Seq(("v", false)))
      .select($"key", $"v").as[(Long, Long)].collect().sorted.toSeq
    val b = TopKPerKey(base.repartition(17), 4, Seq("key"), Seq(("v", false)))
      .select($"key", $"v").as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
    assert(a.length === 13 * 4)
  }

  test("k larger than group size returns whole groups") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("key", "v")
    val got = TopKPerKey(df, 10, Seq("key"), Seq(("v", true)))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 1L), (1L, 2L), (2L, 3L)))
  }
}

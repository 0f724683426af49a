package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NtileSpec extends SparkTestBase {
  import spark.implicits._

  private def buckets(n: Int, k: Int): Seq[Int] =
    (1 to n).toDF("rank")
      .select(PipelineQueries.ntileFromRank(col("rank"), lit(n), k).as("b"))
      .collect().map(_.getInt(0)).toSeq

  test("ntileFromRank matches SQL NTILE remainder rule") {
    // n=10,k=4: NTILE → 3,3,2,2 rows per bucket
    assert(buckets(10, 4) === Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4))
    // exact division
    assert(buckets(8, 4) === Seq(1, 1, 2, 2, 3, 3, 4, 4))
  }

  test("ntileFromRank with n < k gives each row its own bucket (no divide-by-zero)") {
    // base = floor(n/k) = 0: the unguarded otherwise-branch computed x/0
    // in double math → Infinity → cast long → garbage buckets
    assert(buckets(3, 4) === Seq(1, 2, 3))
    assert(buckets(1, 4) === Seq(1))
  }
}

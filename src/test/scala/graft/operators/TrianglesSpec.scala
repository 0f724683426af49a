package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting: exact counts on known graphs, hub
  * orientation, canonicalization of dirty edge lists.
  */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("K4: every node is in C(3,2) = 3 triangles") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val got = counts(k4)
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("star graph has zero triangles; one closing edge makes exactly one") {
    val star = (1L to 6L).map(i => (0L, i))
    assert(counts(star).isEmpty)
    val got = counts(star :+ (3L, 4L))
    assert(got === Map(0L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("duplicate, reversed, and self-loop edges canonicalize away") {
    val dirty = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    val got = counts(dirty)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge: shared nodes count twice") {
    // {1,2,3} and {2,3,4}
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(e) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("coloredEstimate scales the sampled total by scale^3") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val row = Triangles.coloredEstimate(k4.toDF("a", "b"), "a", "b", scale = 4L)
      .as[(Long, Long, Long)].head()
    assert(row === ((4L, 4L, 256L))) // K4 has 4 triangles; 4 * 4^3 = 256
  }

  test("matches brute-force enumeration on a pseudo-random graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for {
      i <- 0 until n; j <- (i + 1) until n if rnd.nextDouble() < 0.2
    } yield (i.toLong, j.toLong)).toSeq
    val adj = edges.toSet
    def has(a: Long, b: Long) = adj.contains((math.min(a, b), math.max(a, b)))
    var brute = Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- 0L until n; b <- (a + 1) until n if has(a, b)
      c <- (b + 1) until n if has(b, c) && has(a, c)
    } {
      brute = brute.updated(a, brute(a) + 1)
        .updated(b, brute(b) + 1).updated(c, brute(c) + 1)
    }
    assert(counts(edges) === brute)
  }
}

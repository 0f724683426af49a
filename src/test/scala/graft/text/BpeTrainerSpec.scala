package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  test("merges the most frequent pair with lexicographic tiebreak; counts and sizes match a hand trace") {
    // corpus: "a b a b c" ×2 docs and "b c d" — pair counts round 1:
    //   (a,b)=4, (b,a)=2, (b,c)=3, (c,d)=1 → winner (a,b)
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b a b c"),
      (3L, "b c d")).toDF("doc_id", "text")
    val out = BpeTrainer.train(docs, "text", "doc_id", rounds = 2)
      .orderBy("round")
      .as[(Int, String, String, Long, Long)].collect().toSeq
    // round 1: docs 1,2 → ["a b","a b","c"]; doc 3 unchanged; 13-4=9 tokens
    assert(out.head === ((1, "a", "b", 4L, 9L)))
    // round 2 pairs: ("a b","a b")=2, ("a b","c")=2, (b,c)=1, (c,d)=1
    //   → count tie broken by pair text: "a b"<"b" ties on lhs, rhs "a b"<"c"
    assert(out(1) === ((2, "a b", "a b", 2L, 7L)))
  }

  test("greedy leftmost non-overlap on runs: 'a a a a' merges positions 0 and 2") {
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val out = BpeTrainer.train(docs, "text", "doc_id", rounds = 1)
      .as[(Int, String, String, Long, Long)].collect().head
    // (a,a) appears 3×; after merging even offsets the corpus is ["a a","a a"]
    assert(out === ((1, "a", "a", 3L, 2L)))
  }

  test("stops early when no pairs remain") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val out = BpeTrainer.train(docs, "text", "doc_id", rounds = 5)
    assert(out.count() === 1) // round 1 merges (x,y); round 2 has no pairs
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "alice", 100L), (2L, "bob", 200L), (3L, "carol", 300L), (4L, "dave", 400L)
  ).toDF("k", "name", "bal")

  // key 1: update then DELETE (delete wins — higher seq)
  // key 2: delete then UPDATE (update wins)
  // key 3: untouched (carry-over)
  // key 5: insert (absent from base)
  private val ops = Seq(
    (1L, 10L, "U", 111L), (1L, 20L, "D", 0L),
    (2L, 10L, "D", 0L), (2L, 20L, "U", 222L),
    (4L, 10L, "U", 444L),
    (5L, 10L, "U", 555L)
  ).toDF("k", "seq", "op", "v")

  test("compact: last writer per key wins") {
    val last = Cdc.compact(ops, Seq("k"), Seq("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(last === Map(1L -> "D", 2L -> "U", 4L -> "U", 5L -> "U"))
  }

  test("merge: delete drops, upsert replaces, carry-over survives, insert appears") {
    val out = Cdc.merge(base, ops, Seq("k"), Seq("seq"), "op", "D",
        Map("bal" -> col("v")))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.get(2), r.getInt(3))).toMap
    assert(!out.contains(1L))                              // deleted
    assert(out(2L) === ((Some("bob"), 222L, 1)))           // updated
    assert(out(3L) === ((Some("carol"), 300L, 0)))         // carry-over
    assert(out(4L) === ((Some("dave"), 444L, 1)))          // updated
    assert(out(5L) === ((None, 555L, 1)))                  // insert: null name
  }

  test("merge ≡ sequential in-memory reducer on randomized logs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val baseRows = (1L to 30L).filter(_ % 2 == 0).map(k => (k, s"n$k", k * 10))
      val opRows = (1 to 200).map { i =>
        ((rnd.nextInt(40) + 1).toLong, i.toLong,
          if (rnd.nextInt(4) == 0) "D" else "U", rnd.nextInt(1000).toLong)
      }
      // reference semantics, computed sequentially: last op per key wins;
      // D removes the key, U sets the value, untouched base rows carry over
      val lastOp = opRows.groupBy(_._1).map { case (k, os) => k -> os.maxBy(_._2) }
      val expected = (baseRows.map(r => r._1 -> (Option(r._2), r._3)).toMap ++
        lastOp.collect { case (k, (_, _, "U", v)) =>
          k -> (baseRows.find(_._1 == k).map(_._2), v) })
        .filterNot { case (k, _) => lastOp.get(k).exists(_._3 == "D") }

      val got = Cdc.merge(baseRows.toDF("k", "name", "bal"),
          opRows.toDF("k", "seq", "op", "v"),
          Seq("k"), Seq("seq"), "op", "D", Map("bal" -> col("v")))
        .collect().map(r => r.getLong(0) -> (Option(r.get(1)).map(_.toString), r.getLong(2)))
        .toMap
      assert(got === expected)
    }
  }

  test("mergeStateful: later batch with LOWER seq never overwrites a newer value") {
    val st0 = Cdc.seedState(base, ops, Seq("seq"))
    // batch 1 carries the HIGH-seq ops, batch 2 the low-seq stragglers —
    // the out-of-order delivery a per-batch Cdc.merge gets wrong
    val batch1 = ops.filter(col("seq") === 20L || col("k") >= 4L)
    val batch2 = ops.filter(col("seq") === 10L && col("k") < 4L)
    val st2 = Cdc.mergeStateful(
      Cdc.mergeStateful(st0, batch1, Seq("k"), Seq("seq"), "op", "D",
        Map("bal" -> col("v"))),
      batch2, Seq("k"), Seq("seq"), "op", "D", Map("bal" -> col("v")))
    val out = Cdc.currentView(st2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // key 1: D@20 applied first; the late U@10 must NOT resurrect it
    assert(!out.contains(1L))
    // key 2: U@20 (222) applied first; the late D@10 must NOT delete it
    assert(out(2L) === 222L)
    assert(out(3L) === 300L && out(4L) === 444L && out(5L) === 555L)
  }

  test("mergeStateful batch-wise ≡ merge on the full log, any batch split") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val baseRows = (1L to 30L).filter(_ % 2 == 0).map(k => (k, s"n$k", k * 10))
      val opRows = rnd.shuffle((1 to 200).map { i =>
        ((rnd.nextInt(40) + 1).toLong, i.toLong,
          if (rnd.nextInt(4) == 0) "D" else "U", rnd.nextInt(1000).toLong)
      })
      val baseDf = baseRows.toDF("k", "name", "bal")
      val opsDf = opRows.toDF("k", "seq", "op", "v")
      val expected = Cdc.merge(baseDf, opsDf, Seq("k"), Seq("seq"), "op", "D",
          Map("bal" -> col("v"))).drop("__changed")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
      // arbitrary 4-way split of the SHUFFLED log → ops arrive across
      // batches in no seq order at all
      val batches = opRows.grouped((opRows.size + 3) / 4).toSeq
      val finalState = batches.foldLeft(Cdc.seedState(baseDf, opsDf, Seq("seq"))) {
        (st, b) => Cdc.mergeStateful(st, b.toDF("k", "seq", "op", "v"),
          Seq("k"), Seq("seq"), "op", "D", Map("bal" -> col("v")))
      }
      val got = Cdc.currentView(finalState)
        .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
      assert(got === expected, s"trial $trial diverged")
    }
  }

  test("merge is idempotent: re-applying the same log changes nothing") {
    val once = Cdc.merge(base, ops, Seq("k"), Seq("seq"), "op", "D",
      Map("bal" -> col("v"))).drop("__changed")
    // same full log again: the delete deletes an already-absent key
    // (no-op), the upserts write the values the rows already hold
    val again = Cdc.merge(once, ops, Seq("k"), Seq("seq"), "op", "D",
      Map("bal" -> col("v"))).drop("__changed")
    assert(again.exceptAll(once).isEmpty && once.exceptAll(again).isEmpty)
  }
}

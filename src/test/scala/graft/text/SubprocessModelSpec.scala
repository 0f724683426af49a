package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SubprocessModelSpec extends SparkTestBase {
  import spark.implicits._

  /** The lexicon scorer as an external awk process: same tokenization
    * (whitespace fields, lowercased, exact lexicon membership) and the same
    * double arithmetic (IEEE division, %.17g round-trips the bits), so its
    * output must be row-identical to the in-JVM Column program.
    *
    * The protocol's streaming contract needs BOTH sides of mawk unbuffered:
    * `-W interactive` makes it consume stdin line-at-a-time (default mawk
    * blocks until a full input buffer — which deadlocks any bounded-window
    * client, as the model's scaladoc warns) and fflush() emits each
    * response immediately.
    */
  private def awkScorer: Seq[String] = {
    val script =
      """BEGIN { np = split(P, pa, " "); for (i = 1; i <= np; i++) pos[pa[i]] = 1;
        |        nn = split(N, na, " "); for (i = 1; i <= nn; i++) neg[na[i]] = 1 }
        |{ p = 0; n = 0;
        |  for (i = 1; i <= NF; i++) { w = tolower($i);
        |    if (w in pos) p++; if (w in neg) n++ }
        |  if (p > n) l = "positive"; else if (n > p) l = "negative"; else l = "neutral";
        |  if (p + n == 0) s = 0.5; else { d = p - n; if (d < 0) d = -d; s = d / (p + n) }
        |  printf "%s\t%.17g\n", l, s; fflush() }""".stripMargin
    Seq("awk", "-W", "interactive",
      "-v", s"P=${WordLists.positive.mkString(" ")}",
      "-v", s"N=${WordLists.negative.mkString(" ")}",
      script)
  }

  test("subprocess scorer is row-identical to the Column-program lexicon") {
    val chunks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text".as("chunk"))
      .repartition(3) // several partitions → several scorer processes
    def collect(m: SentimentModel) =
      m.score(chunks, "chunk").select("doc_id", "label", "score")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    // tiny in-flight window exercises the backpressure path
    val sub = new SubprocessSentimentModel(awkScorer, maxInFlight = 7)
    assert(collect(sub) === collect(new LexiconSentimentModel()))
  }

  test("non-text columns are preserved and schema gains label/score") {
    val chunks = Seq((1L, "meta", "strong growth"), (2L, "more", "loss risk"))
      .toDF("id", "extra", "chunk")
    val out = new SubprocessSentimentModel(awkScorer).score(chunks, "chunk")
    assert(out.columns.toSeq === Seq("id", "extra", "chunk", "label", "score"))
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(3), r.getDouble(4))).toMap
    assert(byId(1L) === (("meta", "positive", 1.0)))
    assert(byId(2L) === (("more", "negative", 1.0)))
  }

  private def fullMessage(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(c => String.valueOf(c.getMessage)).mkString(" | ")

  test("scorer that dies before answering fails the task loudly") {
    val chunks = Seq((1L, "a"), (2L, "b")).toDF("id", "chunk").coalesce(1)
    val boom = new SubprocessSentimentModel(
      Seq("sh", "-c", "echo doomed >&2; exit 3"))
    val e = intercept[Exception] { boom.score(chunks, "chunk").collect() }
    val msg = fullMessage(e)
    // either side can observe the death first: the reader (EOF before all
    // answers / nonzero exit) or the writer (EPIPE on the closed stdin) —
    // all three surface as the scorer's loud failure
    assert(msg.contains("subprocess scorer"))
    assert(msg.contains("doomed")) // stderr tail surfaced
  }

  test("short output (scorer answers some rows then exits) fails the task") {
    val chunks = (1 to 50).map(i => (i.toLong, s"text $i")).toDF("id", "chunk")
      .coalesce(1)
    val short = new SubprocessSentimentModel(
      Seq("awk", "-W", "interactive",
        """NR <= 3 { print "neutral\t0.5"; fflush() } NR == 4 { exit 0 }"""))
    val e = intercept[Exception] { short.score(chunks, "chunk").collect() }
    assert(fullMessage(e).contains("before answering"))
  }

  test("unparsable response line fails the task") {
    val chunks = Seq((1L, "a")).toDF("id", "chunk").coalesce(1)
    val bogus = new SubprocessSentimentModel(
      Seq("awk", "-W", "interactive", """{ print "no-tab-here"; fflush() }"""))
    val e = intercept[Exception] { bogus.score(chunks, "chunk").collect() }
    assert(fullMessage(e).contains("unparsable"))
  }

  test("scorer that answers every row but never exits fails within the deadline") {
    // answers each line correctly, then ignores stdin EOF and sleeps: an
    // unbounded readLine() probe after the last response would wedge the
    // task forever; the bounded waitFor must fail it loudly instead
    val chunks = Seq((1L, "a"), (2L, "b")).toDF("id", "chunk").coalesce(1)
    val zombie = new SubprocessSentimentModel(
      Seq("sh", "-c",
        """while read l; do printf 'neutral\t0.5\n'; done; sleep 600"""),
      exitTimeoutSec = 2)
    val t0 = System.nanoTime()
    val e = intercept[Exception] { zombie.score(chunks, "chunk").collect() }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(fullMessage(e).contains("did not exit within"))
    assert(secs < 60, s"deadline not enforced (took ${secs}s)")
  }

  test("early-stopped consumption reaps the scorer process (task-scoped lifetime)") {
    import scala.jdk.StreamConverters._
    def marked: Long = ProcessHandle.current().descendants().toScala(Seq)
      .count(p => p.info().commandLine()
        .map[Boolean](_.contains("GRAFT_EARLY_STOP_MARKER")).orElse(false)).toLong
    // a unique argv marker so concurrent suites' processes can't interfere
    val markedScorer = awkScorer.patch(1, Seq("-v", "M=GRAFT_EARLY_STOP_MARKER"), 0)
    val chunks = (1 to 5000).map(i => (i.toLong, s"text number $i"))
      .toDF("id", "chunk").coalesce(1)
    val out = new SubprocessSentimentModel(markedScorer)
      .score(chunks, "chunk").limit(3).collect()
    assert(out.length === 3)
    // limit stops the iterator mid-partition; the task-completion listener
    // must still destroy the scorer — wait out the async reap
    val deadline = System.currentTimeMillis() + 15000
    while (System.currentTimeMillis() < deadline && marked > 0) Thread.sleep(200)
    assert(marked === 0, "scorer process survived an early-stopped task")
  }

  test("plugs into the full sentiment pipeline unchanged (T4 contract)") {
    val filings = Seq((1L, "Strong growth in revenue. Some risk and decline."))
      .toDF("doc_id", "body")
    val out = Sentiment.pipeline(filings, "body", Seq("doc_id"),
      model = new SubprocessSentimentModel(awkScorer, name = "awk-lexicon"),
      chunkSize = 30, overlap = 5)
    val r = out.collect().head
    assert(r.getAs[String]("model_name") === "awk-lexicon")
    assert(r.getAs[Long]("chunk_count") >= 1)
  }
}

package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Out-of-process inference seam — the worked example for a scorer that is
  * NOT a JVM library (the reference runs FinBERT in a Python process behind
  * its sentiment handler, models/finbert.py:14-215 /
  * handlers/sentiment.py:356-444). One scorer process is spawned PER
  * PARTITION on the executor, so N concurrent tasks = N scorer processes —
  * the per-core worker-pool shape the reference's handler uses, without any
  * driver-side coordination.
  *
  * Wire protocol (line-oriented over stdin/stdout):
  *  - request: one text per line, with `[\t\n\r]` collapsed to spaces (the
  *    scorer sees the same whitespace-token sequence, so tokenization is
  *    unchanged);
  *  - response: exactly one `label<TAB>score` line per input, in order.
  *
  * Flow control: a writer daemon thread feeds the scorer while the task
  * thread consumes responses, with at most `maxInFlight` rows buffered
  * between them — input I/O overlaps scorer compute (the same pipelining
  * [[BatchSentimentModel]] does in-JVM) and a full OS pipe can never wedge
  * the JVM side. The scorer, in turn, MUST process streaming-wise: consume
  * lines as they arrive and flush each response (any real inference serving
  * loop does). A scorer that block-buffers its INPUT — refusing to answer
  * until a fixed-size read fills — stalls once `maxInFlight` lines are
  * outstanding, exactly like a serving loop that batches beyond its
  * client's request window (e.g. mawk needs `-W interactive`;
  * SubprocessModelSpec demonstrates).
  *
  * Failure semantics: a scorer that exits early, answers short, or emits an
  * unparsable line fails the TASK (the exception carries the scorer's
  * stderr tail), so Spark's retry machinery owns recovery — rows are never
  * silently dropped or mis-aligned.
  */
class SubprocessSentimentModel(
    command: Seq[String],
    override val name: String = "subprocess",
    override val version: String = "1.0",
    maxInFlight: Int = 512,
    exitTimeoutSec: Int = 30) extends SentimentModel with Serializable {
  require(command.nonEmpty, "scorer command must be non-empty")
  require(maxInFlight > 0, "maxInFlight must be positive")

  override def score(chunks: DataFrame, textCol: String): DataFrame = {
    val idx = chunks.schema.fieldIndex(textCol)
    val enc = Encoders.row(
      chunks.schema.add("label", StringType).add("score", DoubleType))
    val cmd = command
    val inFlight = maxInFlight
    val exitSec = exitTimeoutSec
    chunks.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else new SubprocessScorer(rows, idx, cmd, inFlight, exitSec)
    }(enc)
  }
}

/** Per-partition lifecycle: spawn, pump, zip responses, tear down. */
private[text] final class SubprocessScorer(
    rows: Iterator[Row], textIdx: Int, command: Seq[String], maxInFlight: Int,
    exitTimeoutSec: Int = 30)
    extends Iterator[Row] {
  import java.io.{BufferedReader, InputStreamReader}
  import java.nio.charset.StandardCharsets.UTF_8
  import java.util.concurrent.ArrayBlockingQueue

  private val process = new ProcessBuilder(command: _*).start()
  private val stdout = new BufferedReader(
    new InputStreamReader(process.getInputStream, UTF_8))

  // a task can stop consuming mid-partition (limit, take, failure
  // elsewhere) — tie the scorer's lifetime to the TASK, not to iterator
  // exhaustion, or abandoned processes outlive their work
  Option(org.apache.spark.TaskContext.get()).foreach(
    _.addTaskCompletionListener[Unit](_ => process.destroyForcibly()))

  // stderr drained continuously (a blocked stderr pipe would wedge the
  // scorer); last few lines kept for the failure message
  private val errTail = new java.util.concurrent.ConcurrentLinkedDeque[String]
  private val errPump = new Thread(() => {
    val r = new BufferedReader(new InputStreamReader(process.getErrorStream, UTF_8))
    var line = r.readLine()
    while (line != null) {
      errTail.addLast(line)
      while (errTail.size > 10) errTail.pollFirst()
      line = r.readLine()
    }
  }, "graft-scorer-stderr")
  errPump.setDaemon(true)
  errPump.start()

  // writer thread: sanitized text line to the scorer, then the row into the
  // bounded in-flight queue (backpressure: at most maxInFlight rows between
  // the write and the matching response read)
  private val pending = new ArrayBlockingQueue[AnyRef](maxInFlight)
  private val DONE = new Object
  @volatile private var writeFailure: Throwable = null
  private val writer = new Thread(() => {
    try {
      val stdin = process.getOutputStream
      rows.foreach { r =>
        val text = if (r.isNullAt(textIdx)) "" else r.getString(textIdx)
        stdin.write(text.replaceAll("[\t\n\r]", " ").getBytes(UTF_8))
        stdin.write('\n')
        stdin.flush()
        pending.put(r)
      }
      stdin.close()
    } catch { case t: Throwable => writeFailure = t }
    finally pending.put(DONE)
  }, "graft-scorer-writer")
  writer.setDaemon(true)
  writer.start()

  private def fail(why: String): Nothing = {
    process.destroyForcibly()
    val err = String.join("\n", errTail)
    throw new IllegalStateException(
      s"subprocess scorer ${command.head}: $why" +
        (if (err.isEmpty) "" else s"; stderr tail:\n$err"))
  }

  private var staged: AnyRef = null
  override def hasNext: Boolean = {
    if (staged == null) staged = pending.take()
    if (staged eq DONE) {
      pending.put(DONE) // keep terminal, not blocking
      if (writeFailure != null) fail(s"feeding input failed: $writeFailure")
      // Protocol check with a BOUNDED wait: a bare readLine() here only
      // returns when the scorer writes or closes stdout, so a scorer that
      // answered every input but ignores stdin EOF (never exits, never
      // closes stdout) would wedge the task forever. Wait for exit with a
      // deadline first; once the process is gone the pipe is at EOF and
      // ready()/readLine() cannot block.
      if (!process.waitFor(exitTimeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS))
        fail(s"did not exit within ${exitTimeoutSec}s of input EOF")
      if (stdout.ready() && stdout.readLine() != null)
        fail("emitted more lines than inputs")
      val code = process.exitValue()
      if (code != 0) fail(s"exited with code $code")
      false
    } else true
  }

  override def next(): Row = {
    if (!hasNext) throw new NoSuchElementException("scorer exhausted")
    val row = staged.asInstanceOf[Row]
    staged = null
    val line = stdout.readLine()
    if (line == null) fail("exited before answering all inputs")
    val tab = line.indexOf('\t')
    if (tab <= 0) fail(s"unparsable response line: '$line'")
    val score =
      try line.substring(tab + 1).toDouble
      catch { case _: NumberFormatException =>
        fail(s"unparsable score in response line: '$line'")
      }
    Row.fromSeq(row.toSeq :+ line.substring(0, tab) :+ score)
  }
}

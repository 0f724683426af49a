package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver's deterministic parquet fixtures (TESTDATA.md).
  *
  * Every load passes through a SCHEMA CONTRACT: the column types the query
  * suite was built against. Fixtures are regenerated between rounds and
  * their physical types have drifted before (events.ts went ns-int64 →
  * timestamp[us] in round 7, silently erroring 23 queries) — when a
  * contract column comes back with a different type, the loader casts it
  * back to the contract type and prints one stderr warning naming the
  * drift, so a regen shows up as a visible note instead of a broken round.
  */
object Tables {

  /** Expected Spark read types per table, for the columns the suite
    * consumes. Dates ship as parquet timestamp[us] (isAdjustedToUTC=false)
    * → TIMESTAMP_NTZ under Spark 4's inference; keep that as the contract
    * (a tz-adjusted or DATE regen casts back losslessly under the UTC
    * session zone).
    */
  private val contracts: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
    // events.ts has bespoke dual-generation handling in events() below;
    // the remaining columns still get the contract treatment
    "events" -> Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))

  // warn once per (table, drift signature) per JVM — Verify/Bench load
  // each table hundreds of times
  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def normalize(df: DataFrame, name: String): DataFrame = {
    val want = contracts.getOrElse(name, Seq.empty).toMap
    val drifted = df.schema.fields.filter(f =>
      want.get(f.name).exists(_ != f.dataType))
    if (drifted.isEmpty) df
    else {
      val sig = name + ":" + drifted.map(f =>
        s"${f.name} ${f.dataType.simpleString}->${want(f.name).simpleString}")
        .mkString(",")
      if (warned.add(sig))
        System.err.println(s"[tables] fixture schema drift, casting back: $sig")
      import org.apache.spark.sql.functions.col
      df.select(df.columns.map { c =>
        want.get(c).filter(_ != df.schema(c).dataType) match {
          case Some(t) => col(c).cast(t).as(c)
          case None    => col(c)
        }
      }: _*)
    }
  }

  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    normalize(s.read.parquet(s"$dir/$name.parquet"), name)

  def lineitem(s: SparkSession, dir: String): DataFrame = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = apply(s, dir, "region")
  /** events.ts has shipped in two fixture generations: nanosecond-precision
    * parquet (which Spark's vectorized reader only admits as epoch-nanos
    * long via `nanosAsLong`) and, in newer fixtures, plain `timestamp[us]`
    * (surfacing as TIMESTAMP_NTZ). Normalize both to the same two-column
    * contract every consumer relies on: `ts_ns` = epoch-nanos LongType and
    * `ts` = µs-precision TimestampType. DuckDB's `epoch_ns(ts)` oracle side
    * agrees with either generation (ns natively; µs×1000 for the new one).
    */
  // Memoized per-dir epoch scale of a LongType events.ts (ns/us/ms/s →
  // multiplier to ns). A LongType ts is USUALLY the nanosAsLong read of
  // ns-precision parquet, but a regen could ship raw int64 micros — also
  // LongType, indistinguishable at schema level, and silently 1000× wrong
  // without this probe (one tiny max() job per dir per JVM).
  private val eventsTsScale =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def detectLongTsScale(raw: DataFrame, dir: String): Long =
    eventsTsScale.computeIfAbsent(dir, { _ =>
      import org.apache.spark.sql.functions.{abs => fabs, col, max}
      val m = raw.agg(max(fabs(col("ts")))).head()
      val v = if (m.isNullAt(0)) 0L else m.getLong(0)
      // epoch magnitudes for post-1973 instants: s ~1e8+, ms ~1e11+,
      // us ~1e14+, ns ~1e17+
      val mult =
        if (v >= 100000000000000000L) 1L          // already nanos
        else if (v >= 100000000000000L) 1000L     // micros
        else if (v >= 100000000000L) 1000000L     // millis
        else 1000000000L                          // seconds
      if (mult != 1L)
        System.err.println(
          s"[tables] events.ts is int64 at 1/$mult ns scale in $dir — scaling to ns")
      mult
    })

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = apply(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // epoch-integer fixture; scale probed by magnitude
        val mult = detectLongTsScale(raw, dir)
        val renamed = raw.withColumnRenamed("ts", "ts_ns")
        val scaled =
          if (mult == 1L) renamed
          else renamed.withColumn("ts_ns", col("ts_ns") * lit(mult))
        // single home of the precision-critical ns→µs truncation rule
        scaled.withColumn("ts", graft.ticks.MinuteBars.truncateNanos(col("ts_ns")))
      case _ => // µs-precision fixture (TIMESTAMP or TIMESTAMP_NTZ)
        // NTZ→instant under the session zone (UTC in Verify/Bench), matching
        // DuckDB's naive-timestamp epoch_ns interpretation exactly
        val ts = col("ts").cast(TimestampType)
        // same column order as the legacy branch: ts_ns in ts's slot, ts last
        raw.select(raw.columns.map {
          case "ts" => (unix_micros(ts) * 1000L).as("ts_ns")
          case c    => col(c)
        } :+ ts.as("ts"): _*)
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}

package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration of the engine's native expressions as SQL functions, two
  * ways:
  *
  *  - [[GraftFunctions.registerAll]] — imperative, for an existing session
  *    (`SELECT cosine_sim(a, b)` afterwards works in spark.sql);
  *  - [[GraftExtensions]] — a `SparkSessionExtensions` injector for cluster
  *    deployment via `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (the standard way to ship custom Catalyst pieces to every session of
  *    a 1000-executor cluster without code changes in user jobs).
  */
object GraftFunctions {

  /** shingle_hashes(toks, k): k must be a foldable integer literal — the
    * hash loop is specialized on it at plan time.
    */
  private[expressions] def shingleBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(toks, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) =>
      ShingleHashes(toks, k)
    case _ => throw new IllegalArgumentException(
      "shingle_hashes(tokens, k) requires a literal integer k")
  }

  /** unicode_norm(s, 'NFC'): the form must be a literal — the kernel is
    * specialized on it at plan time.
    */
  private[expressions] def unicodeNormBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(s, org.apache.spark.sql.catalyst.expressions.Literal(f, _)) if f != null =>
      UnicodeNormalize(s, f.toString)
    case _ => throw new IllegalArgumentException(
      "unicode_norm(s, form) requires a literal form string (NFC/NFD/NFKC/NFKD)")
  }

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "shingle_hashes" -> (shingleBuilder _),
    "unicode_norm" -> (unicodeNormBuilder _))

  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // symbol→sid partition-pruning rewrite (SURVEY §4 candidate (c)); runs
    // inside the operator-optimization batch, before physical planning
    // extracts partition filters
    e.injectOptimizerRule(_ => new graft.plans.SymbolPruningRule)
    // MERGE INTO a Snapshots-versioned catalog table → Cdc.merge + a
    // partition-pruned snapshot commit (the Delta deployment model: the
    // row-level verb ships as a resolution rule behind spark.sql.extensions)
    e.injectResolutionRule(_ => new graft.sql.SnapshotMergeRule)
    // UPDATE … SET … WHERE … on a versioned table → conditional projection
    // + partition-pruned, base-pinned snapshot commit (no join needed —
    // see SnapshotUpdateRule)
    e.injectResolutionRule(_ => new graft.sql.SnapshotUpdateRule)
    // per-key top-k physical operator (planner strategy)
    e.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
    // SQL maintenance verbs (OPTIMIZE / VACUUM) — a delegating parser
    // that claims exactly those two statements (Spark's grammar has
    // neither) and hands everything else to Spark's own parser
    e.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    Seq(
      ("cosine_sim", (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
      ("dot_product", (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
      ("shingle_hashes", (exprs: Seq[Expression]) => GraftFunctions.shingleBuilder(exprs)),
      ("unicode_norm", (exprs: Seq[Expression]) => GraftFunctions.unicodeNormBuilder(exprs)))
      .foreach { case (name, builder) =>
        e.injectFunction((
          org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[CosineSimilarity].getName, name),
          builder))
      }
  }
}

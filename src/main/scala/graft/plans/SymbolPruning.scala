package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rule: rewrite symbol equality predicates into
  * security_id predicates so partition pruning can engage.
  *
  * The lake's physical layout partitions tick data by `security_id`
  * (reference: `{sid}/{Y}/{MM}` path construction, clients/ticks.py:235-254 —
  * the reference "prunes" by building the path from a symbol→sid lookup
  * before reading). Queries, however, naturally filter by SYMBOL. On a plain
  * scan `symbol = 'X'` reads every sid partition and filters rows; this rule
  * conjoins the implied `security_id IN (sids that ever used X)` predicate —
  * redundant for correctness (symbol = X ⇒ sid ∈ sids(X)), but visible to
  * `PruneFileSourcePartitions`, so a 1000-partition scan collapses to the
  * handful of partitions that can contain the symbol. This is SURVEY §4's
  * candidate (c): the reference's hand-rolled path pruning as a declarative,
  * plan-level rewrite.
  *
  * The symbol→sid map comes from a registered SecurityMaster dimension
  * (driver-held, like the reference's in-memory master and Spark's own
  * broadcast dims; ~50k symbols ⇒ a few MB), and registration is SCOPED TO A
  * LAKE PATH: the rule only rewrites filters whose leaf scan reads under the
  * registered root, so an unrelated table that happens to have `symbol` and
  * `security_id` columns is never touched (its id space need not agree with
  * the master's).
  *
  * Injected via [[graft.expressions.GraftExtensions]]
  * (`spark.sql.extensions`) or per-session with [[SymbolPruning.install]].
  */
object SymbolPruning {

  private case class Registration(rootPath: String, symbolToSids: Map[String, Seq[Long]])

  @volatile private var registration: Option[Registration] = None

  /** Register the symbol→security_id map the rule rewrites through, scoped
    * to scans under `lakeRootPath`. `master` must have `symbol` and
    * `security_id` columns; it is collected (dimension-sized by construction
    * — the reference holds the whole master in memory, security_master.py).
    */
  def register(master: org.apache.spark.sql.DataFrame, lakeRootPath: String): Unit = {
    import org.apache.spark.sql.functions._
    val map = master
      .groupBy(col("symbol"))
      .agg(collect_set(col("security_id").cast("long")).as("sids"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).sorted)
      .toMap
    registration = Some(Registration(normalize(lakeRootPath), map))
  }

  def clear(): Unit = { registration = None }

  /** Install the rule on an existing session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[SymbolPruningRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new SymbolPruningRule

  /** Strip URI scheme for path-prefix comparison (file:/a/b vs /a/b). */
  private def normalize(p: String): String = p.replaceFirst("^[a-zA-Z0-9]+:(//)?", "")

  private[plans] def lookup(symbol: String, leaves: Seq[LogicalPlan]): Option[Seq[Long]] =
    registration.flatMap { reg =>
      val scanUnderRoot = leaves.exists {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.exists(rp =>
              normalize(rp.toString).startsWith(reg.rootPath))
          case _ => false
        }
        case _ => false
      }
      if (scanUnderRoot) reg.symbolToSids.get(symbol) else None
    }
}

class SymbolPruningRule extends Rule[LogicalPlan] {

  private def isCol(e: Expression, name: String): Boolean = e match {
    case a: Attribute => a.name.equalsIgnoreCase(name)
    case _ => false
  }

  /** symbol = 'X' (either literal side) → X */
  private def symbolEquality(e: Expression): Option[String] = e match {
    case EqualTo(a, Literal(s: UTF8String, _)) if isCol(a, "symbol") => Some(s.toString)
    case EqualTo(Literal(s: UTF8String, _), a) if isCol(a, "symbol") => Some(s.toString)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def sidLiterals(sid: Attribute, sids: Seq[Long]): Option[Seq[Literal]] = {
    import org.apache.spark.sql.types._
    sid.dataType match {
      case LongType => Some(sids.map(Literal(_)))
      case IntegerType if sids.forall(_.isValidInt) =>
        Some(sids.map(v => Literal(v.toInt)))
      case StringType =>
        Some(sids.map(v => Literal(UTF8String.fromString(v.toString), StringType)))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val cs = conjuncts(cond)
      val sidAttr = child.output.find(_.name.equalsIgnoreCase("security_id"))
      // Idempotence under the optimizer's FIXED POINT: once added, our In
      // may be rewritten by sibling rules (OptimizeIn → InSet above the
      // inSetConversionThreshold), so matching `In` alone would re-add the
      // predicate every iteration and the batch would never converge
      // (errorOnExceed aborts the query). ANY conjunct referencing
      // security_id counts as already-pruned — user-authored sid predicates
      // mean pruning is handled too.
      val alreadyPruned = sidAttr.exists(sid => cs.exists(_.references.contains(sid)))
      val symbols = cs.flatMap(symbolEquality)
      (sidAttr, symbols.headOption) match {
        case (Some(sid), Some(sym)) if !alreadyPruned =>
          SymbolPruning.lookup(sym, child.collectLeaves()) match {
            case Some(sids) =>
              // conjoin the implied sid-set predicate, with literals coerced
              // to the attribute's type (partition-column inference may have
              // made security_id int or string) — an In over mismatched
              // types would unresolve the plan
              sidLiterals(sid, sids) match {
                case Some(lits) => Filter(And(In(sid, lits), cond), child)
                case None => f // untypeable — leave the plan alone
              }
            case None => f // unregistered symbol or out-of-scope scan
          }
        case _ => f
      }
  }
}

package graft.sql

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, EqualTo, ExprId, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, when}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.DataType

/** `MERGE INTO graft.t USING src ON …` over a Snapshots-versioned table —
  * the SQL spelling of the engine's CDC-apply verb (reference precedent:
  * the daily update IS an upsert — update/app.py:877-940's anti-join
  * append and publishers.py:270-288's replace-year, here restated as one
  * statement).
  *
  * Deployment model is Delta's: a resolution rule injected via session
  * extensions (`spark.sql.extensions=graft.expressions.GraftExtensions`)
  * rewrites the resolved `MergeIntoTable` — Spark's own row-level rewrite
  * ignores tables that don't implement `SupportsRowLevelOperations`, so
  * without the extensions the statement fails with Spark's loud
  * unsupported-operation error rather than doing anything silent.
  *
  * Execution is partition-pruned copy-on-write through the commit
  * protocol: one dup-source-key refusal pass, ONE full-outer equi-join of
  * the pinned base version against the source, first-matching-clause
  * routing evaluated as mutually exclusive CASE branches over the joined
  * row (so matched and unmatched rows get their OWN value expressions),
  * then a dynamic-overwrite commit restricted to the partitions the merge
  * actually touched. The commit is PINNED to the base version it computed
  * against: a concurrent commit landing in between raises the retryable
  * `ConcurrentModificationException` instead of silently losing the
  * concurrent writer's rows (the Delta/Iceberg conflict contract).
  * Re-running the same MERGE is idempotent (same end state, new version).
  *
  * Supported shapes — full ANSI first-match clause routing:
  *  - ON: conjunction of `target.keyCol = <source expr>` equalities
  *    (non-equi ON refuses: a range-matched merge is not key-addressable
  *    copy-on-write);
  *  - any interleaving of `WHEN MATCHED [AND <cond>] THEN UPDATE SET … /
  *    SET *` and `WHEN MATCHED [AND <cond>] THEN DELETE`, evaluated in
  *    declaration order, first match wins; UPDATE values and MATCHED
  *    conditions may read BOTH target and source columns
  *    (`SET bal = tgt.bal + src.delta` accumulates);
  *  - any number of `WHEN NOT MATCHED [AND <cond>] THEN INSERT … /
  *    INSERT *` clauses (conditions and values source-only, per ANSI —
  *    there is no target row to read);
  *  - any interleaving of `WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
  *    UPDATE SET … / DELETE` (conditions and values target-only, per ANSI
  *    — there is no source row to read), first match wins in declaration
  *    order. This is the full-sync verb (the reference's SCD-2 delist
  *    shape: securities absent from today's snapshot get end-dated,
  *    master/security_master.py:1198-1410, otherwise only reachable via
  *    the Scala `applySnapshot`). BY SOURCE makes every base row a
  *    candidate BY DEFINITION, so touched-partition pruning falls back to
  *    the unpruned base scan — the statement is a potential full-table
  *    rewrite and is priced as one (the commit still replaces only the
  *    partitions that actually changed);
  *  - matched rows no clause claims carry over untouched; unmatched
  *    source rows no INSERT claims are ignored (never phantom-inserted);
  *    base rows no BY SOURCE clause claims carry over untouched.
  *
  * `WITH SCHEMA EVOLUTION` is supported through Spark's own resolution:
  * the DML target declares `AUTOMATIC_SCHEMA_EVOLUTION`, so the analyzer
  * computes the AddColumn diff against the USING source and routes it
  * through `GraftCatalog.alterTable` → `Snapshots.evolveSchema` (a
  * metadata-only evolved version) before this rule claims the statement;
  * pre-evolution versions read the new columns as null under time travel.
  *
  * UNCORRELATED scalar and IN subqueries in clause expressions inline at
  * run time (executed once, up front — `SET bal = (SELECT max(…) FROM s)`
  * becomes a literal); correlated subqueries are per-row joins and refuse
  * with the USING-source spelling.
  *
  * Refusals (loud, by design): correlated subqueries, updates
  * of a join-key column, INSERT assigning a key something other than the
  * ON expression, and duplicate source keys (ANSI
  * nondeterminism — deduplicate with `QUALIFY row_number() = 1`).
  */
class SnapshotMergeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m @ MergeIntoTable(_, _, _, _, _, _, _)
        if m.childrenResolved && m.mergeCondition.resolved &&
          SnapshotMerge.targetOf(m.targetTable).isDefined &&
          (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
            .forall(actionResolved) =>
      val (rel, target) = SnapshotMerge.targetOf(m.targetTable).get
      // WITH SCHEMA EVOLUTION is handled BEFORE this rule claims the
      // statement: SnapshotDmlTable declares AUTOMATIC_SCHEMA_EVOLUTION,
      // so Spark's ResolveMergeIntoSchemaEvolution computes the AddColumn
      // diff vs the USING source and calls GraftCatalog.alterTable (a
      // metadata-only evolved version) — by the time the actions resolve
      // here, the target relation already carries the new columns
      SnapshotMerge.rewrite(m, rel, target)
  }

  private def actionResolved(a: MergeAction): Boolean = a match {
    case UpdateStarAction(c) => c.forall(_.resolved)
    case InsertStarAction(c) => c.forall(_.resolved)
    case other => other.resolved
  }

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO a Snapshots-versioned table does not support $what")
}

private[sql] object SnapshotMerge {

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO a Snapshots-versioned table does not support $what")

  /** The writable snapshot table a DML statement resolved, if any. A
    * relation whose table lost the DML wrapper but still points at a
    * graft catalog's versioned table recovers its lake identity through
    * the catalog (the WITH SCHEMA EVOLUTION rebuild path — Spark reloads
    * the evolved table via the privilege-less `loadTable`).
    */
  def targetOf(table: LogicalPlan)
      : Option[(DataSourceV2Relation, SnapshotDmlTarget)] =
    EliminateSubqueryAliases(table) match {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotDmlTarget => Some((r, t))
        case _ => (r.catalog, r.identifier) match {
          case (Some(c: GraftCatalog), Some(id)) =>
            c.dmlShapeFor(id).map(t => (r, t))
          case _ => None
        }
      }
      case _ => None
    }

  /** One WHEN MATCHED clause, declaration order: `cond` (None = always),
    * `assigns` by target-column name (None = DELETE). Expressions may
    * reference target AND source attributes; target references are
    * remapped onto the pinned base read at execution
    * ([[MergeProgram.targetName]]).
    */
  case class MatchedClause(cond: Option[Expression],
      assigns: Option[Seq[(String, Expression)]])

  /** One WHEN NOT MATCHED clause: source-only condition + assignments. */
  case class InsertClause(cond: Option[Expression],
      assigns: Seq[(String, Expression)])

  /** The resolved merge program, carried OPAQUELY inside the command (a
    * plain case class, invisible to Catalyst's expression traversals — the
    * expressions inside reference the analysis-time target relation and
    * are re-bound to the execution-time base read by exprId).
    * `bySource` = the WHEN NOT MATCHED BY SOURCE clauses (target-only
    * expressions; None assigns = DELETE), routed first-match over the
    * full-outer join's source-null side.
    */
  case class MergeProgram(
      keyPairs: Seq[(String, Expression)],
      matched: Seq[MatchedClause],
      inserts: Seq[InsertClause],
      targetName: Map[ExprId, String],
      bySource: Seq[MatchedClause] = Seq.empty)

  /** Build the [[SnapshotMergeCommand]]: extract the key equalities and
    * fold the actions into a [[MergeProgram]] over the raw source plan.
    */
  def rewrite(m: MergeIntoTable, rel: DataSourceV2Relation,
      target: SnapshotDmlTarget): LogicalPlan = {
    val source = m.sourceTable
    val targetAttrs = rel.outputSet
    val sourceAttrs = source.outputSet
    def checked(e: Expression, what: String, sourceOnly: Boolean,
        targetOnly: Boolean = false): Unit = {
      // uncorrelated scalar/IN subqueries inline at run time
      // (DmlRebind.materializeSubqueries); anything else refuses
      e.foreach {
        case s: SubqueryExpression if s.isCorrelated =>
          refuse(s"a CORRELATED subquery in $what (a per-row subquery is " +
            "a join — put it in the USING source)")
        // ListQuery is the accepted InSubquery's own child node
        case _: org.apache.spark.sql.catalyst.expressions.ScalarSubquery |
            _: org.apache.spark.sql.catalyst.expressions.InSubquery |
            _: org.apache.spark.sql.catalyst.expressions.ListQuery => ()
        case s: SubqueryExpression =>
          refuse(s"a ${s.prettyName} subquery in $what (only scalar and " +
            "IN subqueries inline — materialize it into the USING source)")
        case _ => ()
      }
      // touched-partition discovery re-evaluates clause expressions
      // separately from the rewrite join: a non-deterministic value (e.g.
      // rand()) could land rows in a partition the discovery never saw,
      // silently dropping that partition's bystander rows
      if (!e.deterministic)
        refuse(s"a non-deterministic expression in $what (got $e) — " +
          "materialize it into the USING source")
      if (sourceOnly && !e.references.subsetOf(sourceAttrs))
        refuse(s"$what referencing target columns (got $e) — an unmatched " +
          "row has no target side to read")
      if (targetOnly && !e.references.subsetOf(targetAttrs))
        refuse(s"$what referencing source columns (got $e) — an " +
          "unmatched-by-source row has no source side to read")
      if (!e.references.subsetOf(targetAttrs ++ sourceAttrs))
        refuse(s"$what referencing columns outside the merge (got $e)")
    }

    // ON: conjunction of target.key = <source expr>
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keyPairs: Seq[(AttributeReference, Expression)] =
      conjuncts(m.mergeCondition).map {
        case EqualTo(t: AttributeReference, s)
            if targetAttrs.contains(t) && s.references.subsetOf(sourceAttrs) =>
          (t, s)
        case EqualTo(s, t: AttributeReference)
            if targetAttrs.contains(t) && s.references.subsetOf(sourceAttrs) =>
          (t, s)
        case other => refuse(
          s"a non-equality or non-key ON clause (got $other) — use " +
            "`target.col = <source expr>` conjunctions")
      }
    val keyNames = keyPairs.map(_._1.name)
    val onExprOf: Map[String, Expression] =
      keyPairs.map { case (t, s) => t.name -> s }.toMap

    // resolve an assignment list to (target column name → value expr)
    def named(assigns: Seq[Assignment], what: String,
        sourceOnly: Boolean, targetOnly: Boolean = false)
        : Seq[(String, Expression)] =
      assigns.map { a =>
        val attr = a.key match {
          case t: AttributeReference if targetAttrs.contains(t) => t
          case other => refuse(s"$what assigning a non-column target $other")
        }
        checked(a.value, s"a $what value", sourceOnly, targetOnly)
        (attr, a.value)
      }.map { case (attr, v) => (attr.name, v) }

    def starAssigns(what: String): Seq[Assignment] = rel.output.map { t =>
      val s = source.output.find(_.name == t.name).getOrElse(refuse(
        s"$what with source missing target column ${t.name}"))
      Assignment(t, s)
    }

    val matched: Seq[MatchedClause] = m.matchedActions.map {
      case UpdateStarAction(cond) =>
        cond.foreach(checked(_, "a MATCHED condition", sourceOnly = false))
        MatchedClause(cond, Some(filterUpdate(
          named(starAssigns("UPDATE SET *"), "UPDATE", sourceOnly = false),
          keyNames, onExprOf, targetAttrs)))
      case UpdateAction(cond, assigns, _) =>
        cond.foreach(checked(_, "a MATCHED condition", sourceOnly = false))
        MatchedClause(cond, Some(filterUpdate(
          named(assigns, "UPDATE", sourceOnly = false),
          keyNames, onExprOf, targetAttrs)))
      case DeleteAction(cond) =>
        cond.foreach(checked(_, "a MATCHED condition", sourceOnly = false))
        MatchedClause(cond, None)
      case other => refuse(s"matched action $other")
    }
    val inserts: Seq[InsertClause] = m.notMatchedActions.map {
      case InsertStarAction(cond) =>
        cond.foreach(checked(_, "a NOT MATCHED condition", sourceOnly = true))
        InsertClause(cond, checkInsert(
          named(starAssigns("INSERT *"), "INSERT", sourceOnly = true),
          keyNames, onExprOf))
      case InsertAction(cond, assigns) =>
        cond.foreach(checked(_, "a NOT MATCHED condition", sourceOnly = true))
        InsertClause(cond, checkInsert(
          named(assigns, "INSERT", sourceOnly = true), keyNames, onExprOf))
      case other => refuse(s"not-matched action $other")
    }
    // WHEN NOT MATCHED BY SOURCE: the full-sync clauses — base rows whose
    // key the source never mentions. Target-only expressions (ANSI: there
    // is no source row to read; Spark's analyzer scopes them that way
    // already — targetOnly re-checks the contract defensively).
    val bySource: Seq[MatchedClause] = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, assigns, _) =>
        cond.foreach(checked(_, "a NOT MATCHED BY SOURCE condition",
          sourceOnly = false, targetOnly = true))
        MatchedClause(cond, Some(filterUpdate(
          named(assigns, "BY SOURCE UPDATE", sourceOnly = false,
            targetOnly = true),
          keyNames, onExprOf, targetAttrs)))
      case DeleteAction(cond) =>
        cond.foreach(checked(_, "a NOT MATCHED BY SOURCE condition",
          sourceOnly = false, targetOnly = true))
        MatchedClause(cond, None)
      case other => refuse(s"not-matched-by-source action $other")
    }
    if (matched.isEmpty && inserts.isEmpty && bySource.isEmpty)
      refuse("a MERGE with no actions")

    val targetName: Map[ExprId, String] =
      rel.output.map(a => a.exprId -> a.name).toMap

    SnapshotMergeCommand(
      target.lakeRoot, target.lakeTable,
      target.lakePartitionCols, target.lakeStatsCols,
      source, MergeProgram(keyPairs.map { case (t, s) => (t.name, s) },
        matched, inserts, targetName, bySource))
  }

  /** UPDATE assignments: a key assignment that restates the ON clause (or
    * carries the target key itself — `SET *` arrives star-expanded) is a
    * no-op and drops; rewriting a key to anything else is not an upsert.
    */
  private def filterUpdate(assigns: Seq[(String, Expression)],
      keyNames: Seq[String], onExprOf: Map[String, Expression],
      targetAttrs: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Seq[(String, Expression)] = {
    val kept = assigns.filterNot { case (n, v) =>
      keyNames.contains(n) && (onExprOf(n).semanticEquals(v) ||
        (v match {
          case a: AttributeReference => targetAttrs.contains(a) && a.name == n
          case _ => false
        }))
    }
    kept.foreach { case (n, _) =>
      if (keyNames.contains(n)) refuse(
        s"UPDATE of the join key column $n (delete + insert instead)")
    }
    kept
  }

  /** INSERT assignments: a key column must be assigned the ON expression
    * itself — anything else would insert a row whose key differs from its
    * join key (it might silently collide with an existing base key the
    * join just declared unmatched).
    */
  private def checkInsert(assigns: Seq[(String, Expression)],
      keyNames: Seq[String], onExprOf: Map[String, Expression])
      : Seq[(String, Expression)] = {
    assigns.foreach { case (n, v) =>
      if (keyNames.contains(n) && !onExprOf(n).semanticEquals(v)) refuse(
        s"INSERT assigning key column $n an expression different from " +
          s"the ON clause ($v vs ${onExprOf(n)})")
    }
    assigns
  }
}

/** The executable half of [[SnapshotMergeRule]] — a V1 command (the
  * eager-side-effect idiom Spark itself uses for writes that own their
  * commit protocol). `source` is the raw resolved USING plan; `program`
  * carries the clause expressions opaquely (see
  * [[SnapshotMerge.MergeProgram]]).
  */
case class SnapshotMergeCommand(
    root: String, table: String,
    partitionCols: Seq[String], statsCols: Seq[String],
    source: LogicalPlan, program: SnapshotMerge.MergeProgram)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    // the source plan is evaluated several times (dup check, touched-
    // partition discovery, the rewrite join): materialize it once — for
    // cost AND for determinism (a non-deterministic source re-evaluated
    // across passes could match different keys per pass)
    val srcDf = bridge.ofRows(spark, source)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try runMerge(spark, srcDf)
    finally srcDf.unpersist(blocking = false)
  }

  private def runMerge(spark: SparkSession,
      srcDf: org.apache.spark.sql.DataFrame): Seq[Row] = {
    import graft.lake.Snapshots
    // inline uncorrelated subqueries ONCE, up front — every later pass
    // (dup check, discovery, rewrite) then sees identical literal values
    val program = {
      def mat(e: Expression) = DmlRebind.materializeSubqueries(spark, e)
      def matC(cl: SnapshotMerge.MatchedClause) = cl.copy(
        cond = cl.cond.map(mat),
        assigns = cl.assigns.map(_.map { case (n, v) => (n, mat(v)) }))
      this.program.copy(
        keyPairs = this.program.keyPairs.map { case (n, e) => (n, mat(e)) },
        matched = this.program.matched.map(matC),
        bySource = this.program.bySource.map(matC),
        inserts = this.program.inserts.map(i => i.copy(
          cond = i.cond.map(mat),
          assigns = i.assigns.map { case (n, v) => (n, mat(v)) })))
    }
    val latest = Snapshots.latestVersion(spark, root, table).getOrElse(
      throw new IllegalArgumentException(s"no snapshot of $table to merge into"))
    val keyNames = program.keyPairs.map(_._1)
    val srcKeysDf = srcDf
      .select(program.keyPairs.map { case (n, e) => bridge.column(e).as(n) }: _*)

    // ANSI MERGE contract: a source row set that hits one target key twice
    // is nondeterministic — refuse before touching anything
    val dup = srcKeysDf
      .groupBy(keyNames.map(col): _*)
      .count().filter(col("count") > 1).limit(1)
      .collect() // at most one row by construction
    if (dup.nonEmpty) throw new IllegalStateException(
      s"MERGE source matches target key ${dup.head.toSeq.init.mkString("/")} " +
        "more than once — deduplicate the source (QUALIFY row_number() = 1)")

    // the PINNED base: computed against `latest`, committed against
    // `latest` (expectedBase) — a concurrent commit in between raises the
    // retryable ConcurrentModificationException instead of a lost update
    val base = Snapshots.readVersion(spark, root, table, latest)
    val baseAttr: Map[String, Attribute] =
      base.queryExecution.analyzed.output.map(a => a.name -> a).toMap
    def baseOf(name: String): Attribute = baseAttr.getOrElse(name,
      throw new IllegalStateException(
        s"MERGE references target column $name absent from $table@v$latest"))
    // re-bind analysis-time target references onto the pinned base read;
    // the catalog widens integer partition columns to BIGINT, so a width
    // mismatch gets a lossless up-cast
    def remap(e: Expression): Expression = e.transform {
      case a: AttributeReference if program.targetName.contains(a.exprId) =>
        val b = baseOf(program.targetName(a.exprId))
        if (b.dataType == a.dataType) b else Cast(b, a.dataType)
    }
    def castTo(e: Expression, dt: DataType): Column =
      if (e.dataType == dt) bridge.column(e)
      else bridge.column(Cast(e, dt))

    // touched-partition DISCOVERY: the rewrite join must not shuffle the
    // whole table when the merge touches a handful of partitions (the
    // Delta copy-on-write shape, at this engine's partition granularity).
    // A base partition participates only if it (a) holds a matched key —
    // one column-pruned semi-join pass — or (b) is a NEW home: an INSERT
    // clause's partition values (evaluable over the source alone, ANSI),
    // or an UPDATE clause rewriting partition columns (evaluable only
    // when the clause assigns EVERY partition column from source-only
    // expressions — otherwise the new home depends on target values and
    // the scan stays unpruned). Untouched partitions never flow: they
    // carry in the manifest by reference. WHEN NOT MATCHED BY SOURCE
    // defeats pruning BY DEFINITION: every base row whose key the source
    // does not mention is a candidate, so the scan stays unpruned (the
    // commit still replaces only partitions that actually changed).
    val prunePredicate: Option[Column] =
      if (partitionCols.isEmpty || program.bySource.nonEmpty) None
      else {
        val newHomesResolvable = program.matched.forall {
          case SnapshotMerge.MatchedClause(_, Some(assigns)) =>
            val partAssigns = assigns.filter(a => partitionCols.contains(a._1))
            partAssigns.isEmpty || (
              partAssigns.map(_._1).toSet == partitionCols.toSet &&
                partAssigns.forall(!_._2.references.exists(a =>
                  program.targetName.contains(a.exprId))))
          case _ => true
        }
        if (!newHomesResolvable) None
        else {
          // the source is already materialized (persisted) — its exact
          // row count is one cheap cached pass, and a small CDC batch
          // then BROADCASTS into the discovery semi-join: the base side
          // is scanned (key+partition columns only), never shuffled
          val srcRows = srcDf.count()
          val probe =
            if (srcRows <= 1000000L) broadcast(srcKeysDf) else srcKeysDf
          // single-key merges additionally SKIP base files whose sidecar
          // [min,max] cannot intersect the source's key range — on a
          // key-clustered table the discovery opens O(selectivity) files
          // instead of scanning the table (conservative without a
          // sidecar: candidateFiles degrades to every live file)
          val probeBase =
            if (keyNames.lengthCompare(1) == 0 && srcRows > 0) {
              val k = keyNames.head
              val mm = srcKeysDf
                .agg(org.apache.spark.sql.functions.min(col(k)),
                  org.apache.spark.sql.functions.max(col(k))).head()
              if (mm.isNullAt(0)) base.filter(lit(false)) // null keys never match
              else Snapshots.readVersionPruned(spark, root, table, latest,
                k, lit(mm.get(0)), lit(mm.get(1)))
            } else base
          val matchedHomes = probeBase
            .join(probe, keyNames, "left_semi")
            .select(partitionCols.map(col): _*)
          val insertHomes = program.inserts.map { icl =>
            val assignOf = icl.assigns.toMap
            srcDf.select(partitionCols.map { p =>
              val dt = base.schema(p).dataType
              assignOf.get(p).map(e => castTo(e, dt))
                .getOrElse(lit(null).cast(dt)).as(p)
            }: _*)
          }
          val updateHomes = program.matched.collect {
            case SnapshotMerge.MatchedClause(_, Some(assigns))
                if assigns.exists(a => partitionCols.contains(a._1)) =>
              val assignOf = assigns.toMap
              srcDf.select(partitionCols.map { p =>
                castTo(assignOf(p), base.schema(p).dataType).as(p)
              }: _*)
          }
          val homes = (matchedHomes +: (insertHomes ++ updateHomes))
            .reduce(_ unionByName _).na.drop().distinct()
            .collect() // partition-value-sized (dimension data), never row-sized
            .toSeq
          DmlRebind.partitionPredicate(partitionCols, homes)
        }
      }
    val prunedBase = prunePredicate.fold(base)(base.filter)

    // full-outer equi-join on the keys, with presence indicators (nullable
    // key columns cannot signal side presence)
    val baseDf = prunedBase.withColumn("__graft_t", lit(true))
    val srcI = srcDf.withColumn("__graft_s", lit(true))
    val joinCond = program.keyPairs
      .map { case (n, e) => bridge.column(EqualTo(baseOf(n), e)) }
      .reduce(_ && _)
    val joined = baseDf.join(srcI, joinCond, "full_outer")
    val tPresent = col("__graft_t").isNotNull
    val sPresent = col("__graft_s").isNotNull
    val matchedRow = tPresent && sPresent
    val srcOnly = !tPresent && sPresent

    // first-match clause routing as mutually exclusive fire flags; the
    // three clause groups (MATCHED / NOT MATCHED / NOT MATCHED BY SOURCE)
    // route disjoint row sets, so first-match order applies within each
    val tgtOnly = tPresent && !sPresent
    def condOf(c: Option[Expression]): Column =
      c.map(e => coalesce(bridge.column(remap(e)), lit(false)))
        .getOrElse(lit(true))
    val mConds = program.matched.map(cl => condOf(cl.cond))
    val mFires = mConds.indices.map(i =>
      mConds.take(i).foldLeft(matchedRow && mConds(i))(_ && !_))
    val anyMFires =
      if (mConds.isEmpty) lit(false) else matchedRow && mConds.reduce(_ || _)
    val bsConds = program.bySource.map(cl => condOf(cl.cond))
    val bsFires = bsConds.indices.map(i =>
      bsConds.take(i).foldLeft(tgtOnly && bsConds(i))(_ && !_))
    val anyBSFires =
      if (bsConds.isEmpty) lit(false) else tgtOnly && bsConds.reduce(_ || _)
    val deleteFires = (mFires.zip(program.matched) ++
        bsFires.zip(program.bySource))
      .collect { case (f, cl) if cl.assigns.isEmpty => f }
      .reduceOption(_ || _).getOrElse(lit(false))
    val iConds = program.inserts.map(cl => condOf(cl.cond))
    val iFires = iConds.indices.map(j =>
      iConds.take(j).foldLeft(srcOnly && iConds(j))(_ && !_))
    val anyIFires =
      if (iConds.isEmpty) lit(false) else srcOnly && iConds.reduce(_ || _)

    // per-column value: the firing clause's expression, else carry / null
    val baseFields = base.schema.fields.toSeq
    val outCols = baseFields.map { f =>
      val updBranches = (mFires.zip(program.matched) ++
          bsFires.zip(program.bySource)).flatMap {
        case (fire, SnapshotMerge.MatchedClause(_, Some(assigns))) =>
          assigns.collectFirst { case (n, v) if n == f.name =>
            (fire, castTo(remap(v), f.dataType)) }
        case _ => None
      }
      val insBranches = iFires.zip(program.inserts).map {
        case (fire, SnapshotMerge.InsertClause(_, assigns)) =>
          val v = assigns.collectFirst { case (n, e) if n == f.name =>
            castTo(e, f.dataType) }
          (fire, v.getOrElse(lit(null).cast(f.dataType)))
      }
      (updBranches ++ insBranches)
        .foldRight(bridge.column(baseOf(f.name))) { case ((fire, v), acc) =>
          when(fire, v).otherwise(acc)
        }.as(f.name)
    }
    // a target-present row (matched or by-source) survives unless a
    // DELETE clause claimed it; an unmatched source row exists only if an
    // INSERT clause claimed it. __graft_m marks rows WITH a target side —
    // the rows whose OLD partition the commit must name as replaced.
    val keep = !deleteFires && (tPresent || anyIFires)
    val touch = anyMFires || anyIFires || anyBSFires
    val extras = Seq(keep.as("__graft_keep"), touch.as("__graft_touch"),
      tPresent.as("__graft_m")) ++
      partitionCols.map(p =>
        bridge.column(baseOf(p)).as(s"__graft_old_$p"))
    val full = joined.select(outCols ++ extras: _*)
    val result = full.filter(col("__graft_keep"))
      .select(baseFields.map(f => col(f.name)): _*)

    // CDC capture (spark.graft.cdc.write): one extra evaluation of the
    // same pruned join emitting ONLY the changed rows — fired UPDATEs as
    // preimage+postimage pairs, fired DELETEs as preimages, fired INSERTs
    // as postimages; carried rows emit nothing. Written as the commit's
    // change files, making this rewrite-shaped version exactly replayable
    // by the change feed (batch and stream).
    val changes: Option[org.apache.spark.sql.DataFrame] =
      if (!SnapshotCdc.enabled(spark)) None
      else {
        SnapshotCdc.checkReserved(base.columns.toSeq, table)
        import org.apache.spark.sql.functions.{array, explode, struct}
        val updateFires = (mFires.zip(program.matched) ++
            bsFires.zip(program.bySource))
          .collect { case (fl, cl) if cl.assigns.nonEmpty => fl }
          .reduceOption(_ || _).getOrElse(lit(false))
        val insertFires = anyIFires
        def chRow(ct: String, cols: Seq[Column]) =
          struct((cols :+ lit(ct).as(CdfSource.ChangeType)): _*)
        val oldCols = baseFields.map(f =>
          bridge.column(baseOf(f.name)).as(f.name))
        val arr = when(updateFires,
            array(chRow("update_preimage", oldCols),
              chRow("update_postimage", outCols)))
          .when(deleteFires, array(chRow("delete", oldCols)))
          .when(insertFires, array(chRow("insert", outCols)))
          .otherwise(lit(null)) // carried row: explode drops the null array
        Some(joined.select(explode(arr).as("__graft_chg"))
          .select(col("__graft_chg.*")))
      }

    if (partitionCols.isEmpty) {
      Snapshots.commitFullReplace(result, root, table, statsCols,
        operation = "merge", expectedBase = Some(latest), changes = changes)
    } else {
      // partition-pruned copy-on-write: replace ONLY partitions the merge
      // touched — surviving touched rows' (possibly NEW) partitions plus
      // matched-and-claimed rows' OLD partitions (covers a partition a
      // DELETE emptied and the old home of a partition-moving UPDATE)
      val newTouched = full
        .filter(col("__graft_touch") && col("__graft_keep"))
        .select(partitionCols.map(col): _*)
      val oldTouched = full
        .filter(col("__graft_touch") && col("__graft_m"))
        .select(partitionCols.map(p => col(s"__graft_old_$p").as(p)): _*)
      val touched = newTouched.unionByName(oldTouched).distinct()
        .collect() // partition-value-sized (dimension data), never row-sized
        .toSeq
      val prefixes = touched.map { r =>
        require((0 until partitionCols.length).forall(!r.isNullAt(_)),
          s"MERGE into null partition value of $partitionCols")
        partitionCols.zipWithIndex
          .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("", "/", "/")
      }
      if (prefixes.isEmpty) return Seq.empty // nothing matched or inserted
      // literal predicate over the collected touched list (no broadcast
      // machinery for dimension data); a merge touching thousands of
      // partitions falls back to the broadcast semi join
      val commitDf = DmlRebind
        .partitionPredicate(partitionCols, touched)
        .map(result.filter)
        .getOrElse {
          val touchedDf = spark.createDataFrame(
            spark.sparkContext.parallelize(touched, 1),
            org.apache.spark.sql.types.StructType(
              baseFields.filter(f => partitionCols.contains(f.name))))
          result.join(broadcast(touchedDf), partitionCols, "left_semi")
        }
      Snapshots.commitReplacingPrefixes(commitDf, root, table,
        partitionCols, statsCols, prefixes,
        operation = "merge", expectedBase = Some(latest), changes = changes)
    }
    Seq.empty
  }
}

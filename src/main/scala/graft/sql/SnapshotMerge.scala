package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, If, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, Project, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{broadcast, col, lit, struct}

/** `MERGE INTO graft.t USING src ON …` over a Snapshots-versioned table —
  * the SQL spelling of the engine's CDC-apply verb
  * ([[graft.operators.Cdc.merge]]; reference precedent: the daily update
  * IS an upsert — update/app.py:877-940's anti-join-append and
  * publishers.py:270-288's replace-year, here restated as one statement).
  *
  * Deployment model is Delta's: a resolution rule injected via session
  * extensions (`spark.sql.extensions=graft.expressions.GraftExtensions`)
  * rewrites the resolved `MergeIntoTable` — Spark's own row-level rewrite
  * ignores tables that don't implement `SupportsRowLevelOperations`, so
  * without the extensions the statement fails with Spark's loud
  * unsupported-operation error rather than doing anything silent.
  *
  * Execution is partition-pruned copy-on-write through the commit
  * protocol: one key-partitioned dedup guard, ONE full-outer equi-join
  * (`Cdc.merge`), then a dynamic-overwrite commit restricted to the
  * partitions the merge actually touched (matched or inserted) —
  * untouched partitions carry over by manifest reference, exactly like
  * the reference's replace-year cycle. Re-running the same MERGE is
  * idempotent (same end state, new version).
  *
  * Supported shapes (everything else refuses loudly, by design — these
  * are the CDC verbs; arbitrary row-level programs belong in the Scala
  * API):
  *  - ON: conjunction of `target.keyCol = <source expr>` equalities;
  *  - WHEN MATCHED THEN UPDATE SET * / SET col = <source expr>…
  *    (unconditioned), optionally preceded or followed by
  *    WHEN MATCHED [AND <source-only cond>] THEN DELETE;
  *  - WHEN NOT MATCHED THEN INSERT * / (cols) VALUES (<source exprs>)
  *    (unconditioned);
  *  - update-only, insert-only and delete-only merges (matched/unmatched
  *    rows outside the declared clauses carry over untouched);
  *  - assignment values may reference SOURCE columns only (a value that
  *    reads target columns needs the row-level API, not an upsert).
  */
class SnapshotMergeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m @ MergeIntoTable(_, _, _, _, _, _, withSchemaEvolution)
        if m.childrenResolved && m.mergeCondition.resolved &&
          targetOf(m).isDefined &&
          (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
            .forall(actionResolved) =>
      val (rel, target) = targetOf(m).get
      if (withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION (commit the " +
        "new columns via graft.lake.Snapshots.append first)")
      if (m.notMatchedBySourceActions.nonEmpty)
        refuse("WHEN NOT MATCHED BY SOURCE (a full-table rewrite verb — " +
          "use graft.lake.Snapshots.commit)")
      SnapshotMerge.rewrite(m, rel, target)
  }

  private def actionResolved(a: MergeAction): Boolean = a match {
    case UpdateStarAction(c) => c.forall(_.resolved)
    case InsertStarAction(c) => c.forall(_.resolved)
    case other => other.resolved
  }

  private def targetOf(m: MergeIntoTable)
      : Option[(DataSourceV2Relation, SnapshotDmlTarget)] =
    EliminateSubqueryAliases(m.targetTable) match {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotDmlTarget => Some((r, t))
        case _ => None
      }
      case _ => None
    }

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO a Snapshots-versioned table does not support $what")
}

private[sql] object SnapshotMerge {

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO a Snapshots-versioned table does not support $what")

  /** Build the [[SnapshotMergeCommand]]: extract the key equalities, fold
    * the actions into an ops-projection over the SOURCE plan (keys renamed
    * to target names, value expressions, an op route column), and record
    * which rows participate (matched-only / unmatched-only pre-joins).
    */
  def rewrite(m: MergeIntoTable, rel: DataSourceV2Relation,
      target: SnapshotDmlTarget): LogicalPlan = {
    val source = m.sourceTable
    val targetAttrs = rel.outputSet
    val sourceAttrs = source.outputSet
    def sourceOnly(e: Expression, what: String): Unit =
      if (!e.references.subsetOf(sourceAttrs))
        refuse(s"$what referencing target columns (got $e) — only source " +
          "columns are evaluable in an upsert")

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

    // actions → op route + value assignments
    var updateAssigns: Option[Seq[Assignment]] = None
    var deleteAt: Option[(Int, Option[Expression])] = None
    m.matchedActions.zipWithIndex.foreach {
      case (UpdateStarAction(cond), _) =>
        if (cond.nonEmpty) refuse("a conditioned UPDATE (route rows via " +
          "WHEN MATCHED AND cond THEN DELETE, or pre-filter the source)")
        if (updateAssigns.nonEmpty) refuse("multiple UPDATE actions")
        val assigns = rel.output.filterNot(a => keyNames.contains(a.name)).map { t =>
          val s = source.output.find(_.name == t.name).getOrElse(refuse(
            s"UPDATE SET * with source missing target column ${t.name}"))
          Assignment(t, s)
        }
        updateAssigns = Some(assigns)
      case (UpdateAction(cond, assigns, _), _) =>
        if (cond.nonEmpty) refuse("a conditioned UPDATE (route rows via " +
          "WHEN MATCHED AND cond THEN DELETE, or pre-filter the source)")
        if (updateAssigns.nonEmpty) refuse("multiple UPDATE actions")
        updateAssigns = Some(assigns)
      case (DeleteAction(cond), i) =>
        if (deleteAt.nonEmpty) refuse("multiple DELETE actions")
        cond.foreach(sourceOnly(_, "a DELETE condition"))
        deleteAt = Some((i, cond))
      case (other, _) => refuse(s"matched action $other")
    }
    var insertAssigns: Option[Seq[Assignment]] = None
    m.notMatchedActions.foreach {
      case InsertStarAction(cond) =>
        if (cond.nonEmpty) refuse("a conditioned INSERT (pre-filter the source)")
        if (insertAssigns.nonEmpty) refuse("multiple INSERT actions")
        val assigns = rel.output.map { t =>
          val s = source.output.find(_.name == t.name).getOrElse(refuse(
            s"INSERT * with source missing target column ${t.name}"))
          Assignment(t, s)
        }
        insertAssigns = Some(assigns)
      case InsertAction(cond, assigns) =>
        if (cond.nonEmpty) refuse("a conditioned INSERT (pre-filter the source)")
        if (insertAssigns.nonEmpty) refuse("multiple INSERT actions")
        insertAssigns = Some(assigns)
      case other => refuse(s"not-matched action $other")
    }
    if (updateAssigns.isEmpty && insertAssigns.isEmpty && deleteAt.isEmpty)
      refuse("a MERGE with no actions")

    // resolve assignments to (targetColName → source expr); key-column
    // assignments must restate the ON key (anything else would insert a
    // row whose key differs from its join key)
    def named(assigns: Seq[Assignment], what: String): Seq[(String, Expression)] =
      assigns.map { a =>
        val name = a.key match {
          case t: AttributeReference if targetAttrs.contains(t) => t.name
          case other => refuse(s"$what assigning a non-column target $other")
        }
        sourceOnly(a.value, s"a $what value")
        (name, a.value)
      }
    // UPDATE SET * arrives star-EXPANDED (every column, keys included):
    // a key assignment that restates the ON clause is a no-op and drops;
    // rewriting a key to anything else is not an upsert
    val upd = updateAssigns.map(named(_, "UPDATE")).getOrElse(Nil)
      .filterNot { case (n, v) =>
        keyNames.contains(n) &&
          keyPairs.find(_._1.name == n).exists(_._2.semanticEquals(v))
      }
    upd.foreach { case (n, _) =>
      if (keyNames.contains(n)) refuse(
        s"UPDATE of the join key column $n (delete + insert instead)")
    }
    val ins = insertAssigns.map(named(_, "INSERT")).getOrElse(Nil)
    ins.foreach { case (n, v) =>
      if (keyNames.contains(n)) {
        val onExpr = keyPairs.find(_._1.name == n).get._2
        if (!v.semanticEquals(onExpr)) refuse(
          s"INSERT assigning key column $n an expression different from " +
            s"the ON clause ($v vs $onExpr)")
      }
    }
    // value map = union; a column assigned differently by UPDATE and
    // INSERT cannot be one upsert expression
    val valuePairs = (upd ++ ins.filterNot(p => keyNames.contains(p._1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map {
        case (n, vs) =>
          vs.map(_._2).reduce { (a, b) =>
            if (a.semanticEquals(b)) a
            else refuse(s"UPDATE and INSERT assigning column $n different " +
              s"expressions ($a vs $b)")
          } match { case e => (n, e) }
      }

    // op route: actions in declaration order; rows no action claims carry
    // over (encoded as op 'U' with… — see participation modes below)
    val hasUpdate = updateAssigns.nonEmpty
    val hasInsert = insertAssigns.nonEmpty
    val opExpr: Expression = deleteAt match {
      case Some((i, cond)) if hasUpdate =>
        val delFirst = i == 0
        val c = cond.getOrElse(Literal.TrueLiteral)
        if (delFirst) If(c, Literal("D"), Literal("U"))
        else Literal("U") // unconditional UPDATE precedes: DELETE unreachable
      case Some((_, cond)) =>
        if (hasInsert) refuse("DELETE + INSERT without UPDATE (ambiguous " +
          "matched-row routing)")
        Literal("D") // delete-only: rows failing the condition are filtered out
      case None => Literal("U")
    }
    val deleteOnlyCond: Option[Expression] =
      if (deleteAt.nonEmpty && !hasUpdate) deleteAt.get._2 else None

    // the ops projection over the source: keys under target names, value
    // expressions under target names, the op route
    val opsProject: Seq[NamedExpression] =
      keyPairs.map { case (t, s) => Alias(s, t.name)() } ++
        valuePairs.map { case (n, e) => Alias(e, n)() } :+
        Alias(opExpr, "__graft_op")()
    val opsPlan = Project(opsProject,
      deleteOnlyCond.map(c =>
        org.apache.spark.sql.catalyst.plans.logical.Filter(c, source))
        .getOrElse(source))

    SnapshotMergeCommand(
      target.lakeRoot, target.lakeTable,
      target.lakePartitionCols, target.lakeStatsCols,
      opsPlan, keyNames, valuePairs.map(_._1),
      matchedOnly = !hasInsert && deleteAt.isEmpty,
      unmatchedOnly = !hasUpdate && deleteAt.isEmpty && hasInsert)
  }
}

/** The executable half of [[SnapshotMergeRule]] — a V1 command (the
  * eager-side-effect idiom Spark itself uses for writes that own their
  * commit protocol). `ops` is a resolved projection of the MERGE source.
  */
case class SnapshotMergeCommand(
    root: String, table: String,
    partitionCols: Seq[String], statsCols: Seq[String],
    ops: LogicalPlan, keyCols: Seq[String], valueCols: Seq[String],
    matchedOnly: Boolean, unmatchedOnly: Boolean)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(ops)

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.lake.Snapshots
    val latest = Snapshots.latestVersion(spark, root, table).getOrElse(
      throw new IllegalArgumentException(s"no snapshot of $table to merge into"))
    val opsDf = org.apache.spark.sql.graft.bridge.ofRows(spark, ops)

    // ANSI MERGE contract: a source row set that hits one target key twice
    // is nondeterministic — refuse before touching anything
    val dup = opsDf.groupBy(keyCols.map(col): _*)
      .count().filter(col("count") > 1).limit(1)
      .collect() // at most one row by construction
    if (dup.nonEmpty) throw new IllegalStateException(
      s"MERGE source matches target key ${dup.head.toSeq.init.mkString("/")} " +
        "more than once — deduplicate the source (QUALIFY row_number() = 1)")

    val base = Snapshots.readVersion(spark, root, table, latest)
    // participation: an update-only merge must not insert unmatched source
    // rows; an insert-only merge must not rewrite matched rows
    val participating =
      if (matchedOnly)
        opsDf.join(base.select(keyCols.map(col): _*), keyCols, "left_semi")
      else if (unmatchedOnly)
        opsDf.join(base.select(keyCols.map(col): _*), keyCols, "left_anti")
      else opsDf
    val merged = graft.operators.Cdc.merge(
      base, participating.withColumn("__graft_seq", lit(1L)),
      keyCols, Seq("__graft_seq"), "__graft_op", "D",
      valueCols.map(n => n -> col(n)).toMap)

    if (partitionCols.isEmpty) {
      // unpartitioned table: the merge result replaces everything
      Snapshots.commitFullReplace(merged.drop("__changed"), root, table, statsCols)
    } else {
      // partition-pruned copy-on-write: replace ONLY partitions the merge
      // touched — changed/inserted rows' partitions plus matched rows'
      // (covers a partition the merge emptied via DELETE)
      val touched = merged.filter(col("__changed") === 1)
        .select(partitionCols.map(col): _*)
        .unionByName(base
          .join(participating.select(keyCols.map(col): _*), keyCols, "left_semi")
          .select(partitionCols.map(col): _*))
        .distinct()
        .collect() // partition-value-sized (dimension data), never row-sized
        .toSeq
      val prefixes = touched.map { r =>
        require((0 until partitionCols.length).forall(!r.isNullAt(_)),
          s"MERGE into null partition value of $partitionCols")
        partitionCols.zipWithIndex
          .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("", "/", "/")
      }
      if (prefixes.isEmpty) return Seq.empty // nothing matched or inserted
      val touchedDf = spark.createDataFrame(
        spark.sparkContext.parallelize(touched, 1),
        org.apache.spark.sql.types.StructType(
          merged.schema.fields.filter(f => partitionCols.contains(f.name))))
      val commitDf = merged
        .join(broadcast(touchedDf), partitionCols, "left_semi")
        .drop("__changed")
      Snapshots.commitReplacingPrefixes(commitDf, root, table,
        partitionCols, statsCols, prefixes)
    }
    Seq.empty
  }
}

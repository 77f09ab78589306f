package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, V2CommandExec}
import org.apache.spark.sql.functions.{coalesce, lit}

/** SQL `MERGE INTO` over [[SnapshotCatalog]] stores — the lake
  * engine's flagship DML verb, completing the catalog's surface next
  * to time travel and `DELETE FROM`:
  *
  * {{{
  *   MERGE INTO snap.orders t USING updates s ON t.o_orderkey = s.o_orderkey
  *   WHEN MATCHED AND s.op = 'del' THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark's analyzer fully resolves and aligns the statement (star
  * actions expand to per-column assignments); planning would then
  * reject any table without SupportsRowLevelOperations — this strategy
  * claims the resolved [[MergeIntoTable]] FIRST (experimental
  * strategies precede the built-ins) when the target is a
  * SnapshotCatalog tip, and executes it through the store's OWN
  * `mergeDelta`, so the SQL verb inherits the store's whole contract:
  * copy-on-write at file granularity (linked stores carry untouched
  * files by reference — zero I/O), tmp+rename atomic publish, immutable
  * history (version-pinned reads never see the merge; MERGE on a
  * pinned read is rejected because only tip loads carry the hook).
  *
  * TRANSLATION. The ON condition must be an equality on the store's
  * key column (`t.<key> = <source expr>`) — that is what makes
  * "matched" coincide with mergeDelta's key-based upsert. Clauses map
  * to one delta frame + one delete-key frame:
  *
  *  - WHEN MATCHED [AND c] UPDATE → source⋈target rows taking this
  *    clause, assembled per-assignment (unassigned columns keep the
  *    target value — partial SET works);
  *  - WHEN MATCHED [AND c] DELETE → their keys join the delete set;
  *  - WHEN NOT MATCHED [AND c] INSERT → source anti-join target;
  *  - WHEN NOT MATCHED BY SOURCE UPDATE/DELETE → target anti-join
  *    source, same assembly.
  *
  * SQL first-clause-wins ordering is honored (each clause excludes
  * rows an earlier clause of its group took), and the standard's
  * cardinality rule is enforced: a target row matched by more than one
  * source row fails loudly instead of writing duplicates. Reassigning
  * the KEY column is rejected (the store's identity contract; under
  * key-equality match the source key is accepted as trivially equal).
  * Everything untranslatable — non-key ON conditions, `WITH SCHEMA
  * EVOLUTION` — refuses with a descriptive error rather than falling
  * back to a silent approximation.
  *
  * Scale shape: the translation is three broadcast-or-shuffle joins on
  * the key (matched inner, two anti), each feeding mergeDelta's
  * touched-file pruning — the merge cost stays O(delta + touched
  * files), never O(table).
  */
object GraftMergeStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: MergeIntoTable if m.resolved =>
      unwrapTable(m.targetTable) match {
        case Some(t: SnapshotTable) =>
          t.onMerge match {
            // WITH SCHEMA EVOLUTION is resolved BEFORE planning: the
            // analyzer (gated on AUTOMATIC_SCHEMA_EVOLUTION) already
            // routed the source's new columns through the catalog's
            // alterTable (a metadata-only union-schema commit) and
            // re-resolved the merge against the evolved target — by
            // here the plan is an ordinary same-schema merge.
            case Some(hook) => GraftMergeExec(hook, m) :: Nil
            case None => throw new UnsupportedOperationException(
              "MERGE is only supported on the table tip — a version- or " +
                "timestamp-pinned read is immutable history")
          }
        case _ => Nil // not ours: let the built-in strategies decide
      }
    // UPDATE is MERGE's in-place cousin: matched target rows
    // re-assemble with the SET list applied and feed mergeDelta as a
    // self-keyed upsert delta (each row overwrites itself), so the
    // verb inherits the same touched-file pruning and atomic publish
    // classic dynamic partition overwrite: Spark plans
    // OverwritePartitionsDynamic when partitionOverwriteMode=dynamic,
    // and that verb has NO V1 write fallback — so a PARTITIONED store
    // table plans it here, straight onto the store's replaceWhere
    // (replace exactly the partitions the incoming rows touch, carry
    // the rest; one atomic version publish)
    case o: org.apache.spark.sql.catalyst.plans.logical.OverwritePartitionsDynamic
        if o.query.resolved =>
      unwrapTable(o.table) match {
        case Some(t: SnapshotTable) =>
          t.onMerge.flatMap(_.replacePartitions) match {
            case Some(rp) => GraftDynamicOverwriteExec(rp, o.query) :: Nil
            case None => throw new UnsupportedOperationException(
              "dynamic INSERT OVERWRITE needs a PARTITIONED BY table tip — " +
                "declare partition columns at CREATE TABLE, or use static " +
                "overwrite mode for full replacement")
          }
        case _ => Nil
      }
    case u: UpdateTable if u.resolved =>
      unwrapTable(u.table) match {
        case Some(t: SnapshotTable) =>
          t.onMerge match {
            case Some(hook) => GraftUpdateExec(hook, u) :: Nil
            case None => throw new UnsupportedOperationException(
              "UPDATE is only supported on the table tip — a version- or " +
                "timestamp-pinned read is immutable history")
          }
        case _ => Nil
      }
    case _ => Nil
  }

  private def unwrapTable(p: LogicalPlan): Option[org.apache.spark.sql.connector.catalog.Table] =
    p match {
      case SubqueryAlias(_, child) => unwrapTable(child)
      case r: DataSourceV2Relation => Some(r.table)
      // the optimizer's scan pushdown has rewritten the relation by
      // planning time (commands plan on the OPTIMIZED tree)
      case s: DataSourceV2ScanRelation => Some(s.relation.table)
      case _ => None
    }
}

/** Eagerly-run command node for [[GraftMergeStrategy]]: translates the
  * resolved MERGE clauses to (delta, deleteKeys) frames and drives the
  * store hook. Returns no rows (DML). */
case class GraftMergeExec(hook: StoreMergeHook, merge: MergeIntoTable)
    extends V2CommandExec {

  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this

  private def c(e: Expression): Column = ExpressionUtils.column(e)

  private def refuse(msg: String): Nothing =
    throw new UnsupportedOperationException(s"MERGE through SnapshotCatalog: $msg")

  private def stripCast(e: Expression): Expression = e match {
    case cast: Cast => stripCast(cast.child)
    case other => other
  }

  override def run(): Seq[InternalRow] = {
    val spark = session
    val keyCol = hook.keyCol()
    val tgtPlan = merge.targetTable
    val srcPlan = merge.sourceTable
    val tgt = Dataset.ofRows(spark, tgtPlan)
    val src = Dataset.ofRows(spark, srcPlan)
    val tgtOut = tgtPlan.output
    val srcRefs = srcPlan.outputSet
    val keyAttr = tgtOut.find(_.name == keyCol).getOrElse(refuse(
      s"target has no column '$keyCol' (the key recorded in _store.json)"))

    // the ON condition must be equality on the store key — that is the
    // exact condition under which "matched" means "key exists", which
    // is what mergeDelta's upsert implements
    val srcKey: Expression = merge.mergeCondition match {
      case EqualTo(l, r) => (stripCast(l), stripCast(r)) match {
        case (a: AttributeReference, s)
          if a.exprId == keyAttr.exprId && s.references.subsetOf(srcRefs) => s
        case (s, a: AttributeReference)
          if a.exprId == keyAttr.exprId && s.references.subsetOf(srcRefs) => s
        case _ => refuse(
          s"the ON condition must be an equality on the store's key column " +
            s"'$keyCol' (t.$keyCol = <source expression>); got: " +
            merge.mergeCondition.sql)
      }
      case other => refuse(
        s"the ON condition must be a single equality on the store's key column " +
          s"'$keyCol'; got: ${other.sql}")
    }

    val onCond = c(merge.mergeCondition)
    // resolved assignment → (target column, value); nested keys refused
    def keyOf(a: Assignment): Attribute = stripCast(a.key) match {
      case attr: AttributeReference => attr
      case other => refuse(s"assignment to a non-column target ${other.sql}")
    }
    // full target-shaped row: assigned columns take the assignment
    // value, the rest keep `fallback` (target value for UPDATE, null
    // for INSERT) — so partial SET lists work on both paths.
    // `guardKey` (UPDATE paths): the key is row identity — accept only
    // the target key or (trivially equal under the ON condition) the
    // source key expression, refuse a genuine reassignment.
    def assemble(assigns: Seq[Assignment], frame: DataFrame,
        fallback: Attribute => Column, guardKey: Boolean): DataFrame = {
      val byId = assigns.map(a => keyOf(a).exprId -> a.value).toMap
      frame.select(tgtOut.map { ta =>
        val v = byId.get(ta.exprId) match {
          case Some(value) if guardKey && ta.exprId == keyAttr.exprId =>
            val bare = stripCast(value)
            if (bare.semanticEquals(keyAttr) || bare.semanticEquals(srcKey)) c(value)
            else refuse(s"reassigning the key column '$keyCol' " +
              s"(SET $keyCol = ${value.sql}) would change row identity")
          case Some(value) => c(value)
          case None => fallback(ta)
        }
        v.as(ta.name)
      }: _*)
    }
    // SQL clause ordering: a row takes the FIRST clause of its group
    // whose condition is TRUE (null = not satisfied)
    def clauseSplit(actions: Seq[MergeAction], frame: DataFrame): Seq[(MergeAction, DataFrame)] = {
      var prior: Column = lit(false)
      actions.map { a =>
        val mine = a.condition.map(e => coalesce(c(e), lit(false))).getOrElse(lit(true))
        val taken = frame.filter(mine && !prior)
        prior = prior || mine
        (a, taken)
      }
    }

    val matched =
      if (merge.matchedActions.isEmpty) None
      else Some(src.join(tgt, onCond, "inner"))
    // the standard's cardinality rule: one target row, at most one
    // matching source row when any matched clause exists
    matched.foreach { j =>
      import org.apache.spark.sql.functions.count
      val dup = j.groupBy(c(keyAttr)).agg(count(lit(1)).as("__n"))
        .filter(org.apache.spark.sql.functions.col("__n") > 1).limit(1).count()
      if (dup > 0) refuse(
        "a target row is matched by more than one source row " +
          "(MERGE cardinality violation) — deduplicate the source on the key")
    }

    val updates = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val deletes = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    matched.foreach { j =>
      clauseSplit(merge.matchedActions, j).foreach {
        case (u: UpdateAction, rows) =>
          updates += assemble(u.assignments, rows, c, guardKey = true)
        case (_: DeleteAction, rows) => deletes += rows.select(c(keyAttr).as(keyCol))
        case (other, _) => refuse(s"unsupported WHEN MATCHED action: $other")
      }
    }
    if (merge.notMatchedActions.nonEmpty) {
      val srcOnly = src.join(tgt, onCond, "left_anti")
      clauseSplit(merge.notMatchedActions, srcOnly).foreach {
        case (i: InsertAction, rows) =>
          // an INSERT key is a NEW identity — any expression is fine,
          // except one colliding with an existing target key: the
          // store's key-upsert contract would silently REPLACE that
          // row where SQL would duplicate it, so refuse. Under the
          // canonical `ON t.key = s.key` + `INSERT *` the inserted key
          // IS the anti-joined source key — provably collision-free,
          // no check runs.
          val insKey = i.assignments.find(a => keyOf(a).exprId == keyAttr.exprId)
            .getOrElse(refuse(s"INSERT must assign the key column '$keyCol'")).value
          val frame = assemble(i.assignments, rows,
            ta => lit(null).cast(ta.dataType), guardKey = false)
          if (!stripCast(insKey).semanticEquals(srcKey)) {
            val collides = rows.join(tgt, c(insKey) === c(keyAttr), "left_semi")
              .limit(1).count() > 0
            if (collides) refuse(
              s"INSERT assigns the key column '$keyCol' from ${insKey.sql}, which " +
                "collides with an existing target key — the store's key is a " +
                "unique identity, so this INSERT would silently replace a row " +
                "SQL semantics would duplicate")
          }
          updates += frame
        case (other, _) => refuse(s"unsupported WHEN NOT MATCHED action: $other")
      }
    }
    if (merge.notMatchedBySourceActions.nonEmpty) {
      val tgtOnly = tgt.join(src, onCond, "left_anti")
      clauseSplit(merge.notMatchedBySourceActions, tgtOnly).foreach {
        case (u: UpdateAction, rows) =>
          updates += assemble(u.assignments, rows, c, guardKey = true)
        case (_: DeleteAction, rows) => deletes += rows.select(c(keyAttr).as(keyCol))
        case (other, _) => refuse(s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
      }
    }

    val delta = updates.reduceOption(_ unionByName _)
      .getOrElse(tgt.select(tgtOut.map(a => c(a).as(a.name)): _*).limit(0))
    val deleteKeys = deletes.reduceOption(_ unionByName _)
    hook.run(delta, deleteKeys)
    Nil
  }
}

/** Eagerly-run command node for dynamic `INSERT OVERWRITE` on a
  * PARTITIONED store table: evaluates the source query and hands the
  * frame to the store's replaceWhere — partitions present in the data
  * replace wholesale, untouched partitions carry (by reference on the
  * linked layout). */
case class GraftDynamicOverwriteExec(
    replacePartitions: org.apache.spark.sql.DataFrame => Unit,
    query: LogicalPlan) extends V2CommandExec {
  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this
  override def run(): Seq[InternalRow] = {
    replacePartitions(Dataset.ofRows(session, query))
    Nil
  }
}

/** Eagerly-run command node for SQL `UPDATE cat.store SET … [WHERE …]`:
  * the WHERE-matched target rows (all rows without a WHERE — the full
  * rewrite SQL asks for) re-assemble with the SET list applied
  * (unassigned columns keep the target value; assigning the key column
  * refuses — it is row identity) and land through the store's own
  * `mergeDelta` as an upsert delta whose keys all pre-exist, so cost
  * stays O(matched + touched files) and history stays immutable. */
case class GraftUpdateExec(hook: StoreMergeHook, update: UpdateTable)
    extends V2CommandExec {

  override def output: Seq[Attribute] = Nil
  override def children: Seq[SparkPlan] = Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this

  private def c(e: Expression): Column = ExpressionUtils.column(e)

  private def refuse(msg: String): Nothing =
    throw new UnsupportedOperationException(s"UPDATE through SnapshotCatalog: $msg")

  private def stripCast(e: Expression): Expression = e match {
    case cast: Cast => stripCast(cast.child)
    case other => other
  }

  override def run(): Seq[InternalRow] = {
    val spark = session
    val keyCol = hook.keyCol()
    val tgtPlan = update.table
    val tgt = Dataset.ofRows(spark, tgtPlan)
    val tgtOut = tgtPlan.output
    val keyAttr = tgtOut.find(_.name == keyCol).getOrElse(refuse(
      s"target has no column '$keyCol' (the key recorded in _store.json)"))
    // WHERE with a null result keeps the row unmatched, same as filter
    val matched = update.condition
      .map(e => tgt.filter(coalesce(c(e), lit(false)))).getOrElse(tgt)
    val byId = update.assignments.map(a => (stripCast(a.key) match {
      case attr: AttributeReference => attr.exprId
      case other => refuse(s"assignment to a non-column target ${other.sql}")
    }) -> a.value).toMap
    val delta = matched.select(tgtOut.map { ta =>
      val v = byId.get(ta.exprId) match {
        case Some(value) if ta.exprId == keyAttr.exprId =>
          // the analyzer's alignment may add an identity self-assign;
          // only a genuine reassignment changes row identity
          if (stripCast(value).semanticEquals(keyAttr)) c(value)
          else refuse(s"reassigning the key column '$keyCol' " +
            s"(SET $keyCol = ${value.sql}) would change row identity")
        case Some(value) => c(value)
        case None => c(ta)
      }
      v.as(ta.name)
    }: _*)
    hook.run(delta, None)
    Nil
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** A graft V1Scan that can hand the optimizer its stats-bearing
  * [[org.apache.spark.sql.sources.BaseRelation]] directly.
  *
  * WHY: Spark's V2ScanRelationPushDown wraps every V1Scan in a
  * [[V1ScanWrapper]] that forwards the scan surface but NOT
  * `SupportsReportStatistics` — so a store-read route served as a
  * V1Scan (DV-masked / column-mapped / temporal versions, the bounded
  * `.changes` feed) always planned with `defaultSizeInBytes`
  * (Long.MaxValue): a 10-row masked dimension table could NEVER
  * broadcast, and every SQL join against it shuffled the fact side.
  * The scan exposes the exact relation `toV1TableScan` would build
  * (whose `sizeInBytes` is checkpoint-served), and
  * [[V1StatsRelationRule]] swaps the wrapped node for a classic
  * [[LogicalRelation]] over it — V1 planning then sees real
  * statistics AND keeps the PrunedFilteredScan column/filter
  * pushdown it already had through the fallback. */
private[graft] trait GraftV1RelationScan
    extends org.apache.spark.sql.connector.read.V1Scan {
  def v1Relation(context: org.apache.spark.sql.SQLContext)
      : org.apache.spark.sql.sources.BaseRelation
}

/** Optimizer rule (injected pre-CBO / as an extra optimization):
  * replace `DataSourceV2ScanRelation(V1ScanWrapper(g: GraftV1RelationScan))`
  * with `LogicalRelation(g.v1Relation, …)` so join selection reads the
  * relation's real `sizeInBytes`. Output attributes carry over
  * verbatim (same schema source), so no rebinding happens upstream.
  * Batch reads only — streaming plans use different node classes and
  * never match. Idempotent: the produced LogicalRelation no longer
  * matches. */
private[graft] object V1StatsRelationRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, MergeIntoTable, UpdateTable}

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // DML TARGETS stay V2 relations: GraftMergeStrategy's unwrapTable
    // and Spark's own row-level planning match DataSourceV2[Scan]
    // Relation to find the store hooks — converting the target would
    // sever them. A DML node may sit ANYWHERE in the tree (`WITH ...
    // MERGE INTO` nests it under WithCTE), so the exclusion collects
    // protected scan INSTANCES from every DML subtree first, then
    // converts the rest (a MERGE SOURCE is a plain read and still
    // benefits; UPDATE/DELETE subtrees stay untouched wholesale, as
    // before, since row-level planning rewrites them itself).
    val shielded = new java.util.IdentityHashMap[LogicalPlan, Unit]()
    def shield(p: LogicalPlan): Unit = p.foreach {
      case sr: DataSourceV2ScanRelation => shielded.put(sr, ()): Unit
      case _ => ()
    }
    plan.foreach {
      case m: MergeIntoTable => shield(m.targetTable)
      case u: UpdateTable => shield(u)
      case d: DeleteFromTable => shield(d)
      case _ => ()
    }
    plan.transform {
      case sr: DataSourceV2ScanRelation if !shielded.containsKey(sr) =>
        val inner = sr.scan match {
          case w: V1ScanWrapper => w.v1Scan
          case s => s
        }
        inner match {
          case g: GraftV1RelationScan =>
            LogicalRelation(g.v1Relation(SparkSession.active.sqlContext),
              sr.output, None, isStreaming = false, None)
          case _ => sr
        }
    }
  }
}

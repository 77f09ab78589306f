package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, EqualTo, Expression, GenericInternalRow, JoinedRow, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, SpecifiedWindowFrame, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k-per-key as a first-class operator (SURVEY §2 custom
  * operators): logical node + physical exec + planner strategy +
  * optimizer rule, wired through `GraftExtensions`.
  *
  * The declarative formulation —
  * `row_number().over(partitionBy(key).orderBy(o)) ≤ k` — sorts EVERY
  * key's full row group before discarding all but k rows. This
  * operator keeps a bounded k-element heap per key instead: O(n log k)
  * with O(keys·k) memory, no per-group sort buffer, no spill pressure
  * from groups that are huge but only contribute k rows — exactly the
  * skewed-key case that hurts at 100 TB.
  *
  * The optimizer rule rewrites the declarative pattern automatically,
  * so `queries()` stay plain DataFrame code and still get the
  * operator; `TopKPerKeyRule` proves the (c)-path of the custom
  * operator preference order end-to-end.
  */
case class TopKPerKey(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val partExprs = partitionExprs
    val orderLocal = order
    val childOutput = child.output
    val outAttrs = output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(orderLocal, childOutput)
      // max-heap on the sort order: the root is the WORST of the kept
      // rows and is evicted when a better row arrives
      val heapOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(a, b)
      }
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        // look up with the reused projection row; copy only on insert
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty(heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) {
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val sorted: Seq[UnsafeRow] = heap.dequeueAll[UnsafeRow].reverse
        sorted.iterator.zipWithIndex.map { case (row: UnsafeRow, idx: Int) =>
          toUnsafe(joined(row, new GenericInternalRow(Array[Any](idx + 1))))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(p, o, k, rank, child) =>
      TopKPerKeyExec(p, o, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(row_number_attr <= k)` directly above the Window
  * that defines it (the shape left after filter pushdown) into
  * [[TopKPerKey]]. Conservative: fires only for a single row_number
  * window expression with the standard running frame and a literal
  * bound, with non-empty partition keys (a global top-k is already
  * handled well by TakeOrderedAndProject). */
object TopKPerKeyRule extends Rule[LogicalPlan] {

  private def rankBound(cond: Expression, rankAttr: Attribute): Option[Int] = {
    def isRank(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == rankAttr.exprId
      case Cast(inner, _, _, _) => isRank(inner)
      case _ => false
    }
    cond match {
      case LessThanOrEqual(e, Literal(v: Int, _)) if isRank(e) => Some(v)
      case LessThanOrEqual(e, Literal(v: Long, _)) if isRank(e) && v <= Int.MaxValue => Some(v.toInt)
      case LessThan(e, Literal(v: Int, _)) if isRank(e) => Some(v - 1)
      case LessThan(e, Literal(v: Long, _)) if isRank(e) && v <= Int.MaxValue => Some(v.toInt - 1)
      // argmax/argmin shape: row_number() = 1 keeps exactly the top row
      case EqualTo(e, Literal(1, _)) if isRank(e) => Some(1)
      case EqualTo(e, Literal(1L, _)) if isRank(e) => Some(1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partitionSpec, orderSpec, _: SpecifiedWindowFrame)), _)),
          _, _, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      rankBound(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          // Spark's InsertWindowGroupLimit has usually already slotted a
          // WindowGroupLimit under the Window; the heap subsumes its
          // sort+prune, so strip it rather than sorting twice.
          val source = child match {
            case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
            case other => other
          }
          TopKPerKey(partitionSpec, orderSpec, k, alias.toAttribute, source)
        case _ => f
      }
  }
}

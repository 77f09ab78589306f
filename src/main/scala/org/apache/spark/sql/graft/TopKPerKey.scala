package org.apache.spark.sql.graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
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
  * operators): logical node + physical execs + planner strategy +
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
  * Memory safety (high key cardinality): the number of HEAPS — one per
  * distinct key — is the unbounded dimension, so the final exec caps
  * the in-memory key map at `spark.graft.topk.maxKeysInMemory` and
  * spills rows of overflow keys to a local file, processed recursively
  * (each pass retires up to maxKeys keys exactly). The pre-shuffle
  * partial exec never spills: once its map is full it forwards rows of
  * unseen keys un-pruned — the final exec restores exactness.
  *
  * The optimizer rule rewrites the declarative pattern automatically
  * (opt out via `spark.graft.topk.rewrite.enabled=false`), so
  * `queries()` stay plain DataFrame code and still get the operator;
  * `TopKPerKeyRule` proves the (c)-path of the custom operator
  * preference order end-to-end.
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

private[graft] object TopKShared {
  val MAX_KEYS_CONF = "spark.graft.topk.maxKeysInMemory"
  val REWRITE_CONF = "spark.graft.topk.rewrite.enabled"
  val DEFAULT_MAX_KEYS = 1 << 20

  /** Per-key bounded heaps over an UnsafeRow stream. Shared by the
    * partial (pass-through overflow) and final (spill overflow) execs.
    *
    * @param onOverflow called for each row whose key is absent once the
    *                   map holds `maxKeys` keys; the row is NOT added.
    * @return the key map, in first-seen key order.
    */
  def fillHeaps(
      iter: Iterator[UnsafeRow],
      keyProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      maxKeys: Int,
      k: Int,
      onOverflow: UnsafeRow => Unit): mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[UnsafeRow]] = {
    // max-heap on the sort order: the root is the WORST of the kept
    // rows and is evicted when a better row arrives
    val heapOrd: Ordering[UnsafeRow] = (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b)
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
    iter.foreach { row =>
      // look up with the reused projection row; copy only on insert
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < k) heap.enqueue(row.copy())
          else if (ordering.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(row.copy())
          }
        case None if heaps.size < maxKeys =>
          val h = mutable.PriorityQueue.empty(heapOrd)
          h.enqueue(row.copy())
          heaps.put(key.copy(), h)
        case None => onOverflow(row)
      }
    }
    heaps
  }

  /** Length-prefixed UnsafeRow spill writer/reader (local scratch). */
  final class Spill(numFields: Int) {
    private val file: File = File.createTempFile("graft-topk-spill-", ".bin")
    file.deleteOnExit()
    private var out: DataOutputStream = _
    private val writeBuffer = new Array[Byte](8 << 10)
    var rows = 0L

    def write(row: UnsafeRow): Unit = {
      if (out == null) out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, writeBuffer)
      rows += 1
    }

    /** One-shot read iterator; deletes the file on exhaustion. */
    def read(): Iterator[UnsafeRow] = {
      out.close()
      val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file), 1 << 16))
      val row = new UnsafeRow(numFields)
      var remaining = rows
      new Iterator[UnsafeRow] {
        override def hasNext: Boolean = {
          val more = remaining > 0
          if (!more) { in.close(); file.delete(): Unit }
          more
        }
        override def next(): UnsafeRow = {
          remaining -= 1
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          row.pointTo(bytes, len)
          row
        }
      }
    }

    def delete(): Unit = file.delete(): Unit
  }
}

/** Exact top-k-per-key over key-clustered input, with recursive spill
  * above the in-memory key cap. Appends the 1-based rank column. */
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
    val maxKeys = conf.getConfString(TopKShared.MAX_KEYS_CONF,
      TopKShared.DEFAULT_MAX_KEYS.toString).toInt
    val numFields = childOutput.length
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(orderLocal, childOutput)
      val toUnsafeChild = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val unsafeIter = iter.map {
        case u: UnsafeRow => u
        case r => toUnsafeChild(r)
      }
      val toUnsafeOut = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      def emit(heaps: mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]): Iterator[InternalRow] =
        heaps.iterator.flatMap { case (_, heap) =>
          val sorted: Seq[UnsafeRow] = heap.dequeueAll[UnsafeRow].reverse
          sorted.iterator.zipWithIndex.map { case (row: UnsafeRow, idx: Int) =>
            toUnsafeOut(joined(row, new GenericInternalRow(Array[Any](idx + 1))))
          }
        }

      // Each pass holds ≤ maxKeys heaps; rows of keys beyond the cap
      // spill to a local file and are retired by the next pass. Exact:
      // a key's rows are never split across the map and the spill.
      def process(input: Iterator[UnsafeRow]): Iterator[InternalRow] = {
        var spill: TopKShared.Spill = null
        val heaps = TopKShared.fillHeaps(input, keyProj, ordering, maxKeys, kLocal, { row =>
          if (spill == null) {
            spill = new TopKShared.Spill(numFields)
            Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => spill.delete()))
          }
          spill.write(row)
        })
        if (spill == null) emit(heaps)
        else emit(heaps) ++ process(spill.read())
      }

      process(unsafeIter)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Pre-shuffle best-effort prune: per map partition, keep at most k
  * rows per key for the first `maxKeys` keys seen and forward overflow
  * keys' rows untouched. Output order/rank is irrelevant — the final
  * [[TopKPerKeyExec]] above the exchange recomputes exact ranks — so
  * this is the map-side-combine twin of partial aggregation: shuffle
  * volume drops from n rows to ≈ localKeys·k. */
case class TopKPartialExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val partExprs = partitionExprs
    val orderLocal = order
    val childOutput = child.output
    val maxKeys = conf.getConfString(TopKShared.MAX_KEYS_CONF,
      TopKShared.DEFAULT_MAX_KEYS.toString).toInt
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(orderLocal, childOutput)
      val toUnsafeChild = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val unsafeIter = iter.map {
        case u: UnsafeRow => u
        case r => toUnsafeChild(r)
      }
      val heapOrd: Ordering[UnsafeRow] = (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b)
      // Single streaming pass: rows of the first maxKeys keys fold into
      // bounded heaps (flushed when input ends); rows of later keys are
      // handed straight downstream un-pruned and never buffered, so
      // memory stays ≤ maxKeys·k rows regardless of key cardinality.
      new Iterator[InternalRow] {
        private val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
        private var flush: Iterator[UnsafeRow] = null
        private var staged: UnsafeRow = null

        private def advance(): Unit = {
          while (staged == null && flush == null) {
            if (!unsafeIter.hasNext) {
              flush = heaps.iterator.flatMap(_._2.iterator)
            } else {
              val row = unsafeIter.next()
              val key = keyProj(row)
              heaps.get(key) match {
                case Some(heap) =>
                  if (heap.size < kLocal) heap.enqueue(row.copy())
                  else if (ordering.compare(row, heap.head) < 0) {
                    // evicted root is provably outside this key's top-k
                    heap.dequeue()
                    heap.enqueue(row.copy())
                  } // else: row itself is outside the local top-k — drop
                case None if heaps.size < maxKeys =>
                  val h = mutable.PriorityQueue.empty(heapOrd)
                  h.enqueue(row.copy())
                  heaps.put(key.copy(), h)
                case None =>
                  // key map full: forward as-is (consumed by the shuffle
                  // writer before the next hasNext, so no copy needed)
                  staged = row
              }
            }
          }
        }

        override def hasNext: Boolean = {
          advance()
          staged != null || flush.hasNext
        }
        override def next(): InternalRow = {
          advance()
          if (staged != null) { val r = staged; staged = null; r }
          else flush.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(p, o, k, rank, child) =>
      TopKPerKeyExec(p, o, k, rank, TopKPartialExec(p, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(row_number_attr <= k)` directly above the Window
  * that defines it (the shape left after filter pushdown) into
  * [[TopKPerKey]]. Conservative: fires only for a single row_number
  * window expression with the standard running frame and a literal
  * bound, with non-empty partition keys (a global top-k is already
  * handled well by TakeOrderedAndProject). Disable with
  * `spark.graft.topk.rewrite.enabled=false` to fall back to Spark's
  * sort-based window path. */
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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(TopKShared.REWRITE_CONF, "true").toBoolean) return plan
    plan.transformUp {
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
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Logical per-key top-k: keep the k best rows per key, "best" =
  * highest `order` (DoubleType), ties broken by lowest `tie`
  * (LongType). Rows whose `order` evaluates to NULL are DROPPED
  * (unlike a window row_number, which would rank them last); NaN
  * orders rank greatest, matching Spark's descending sort.
  *
  * Why a custom operator: Spark expresses per-group top-k as
  * `row_number().over(Window...)` + filter, which materializes and
  * SORTS every group in full before discarding all but k rows. This
  * operator keeps a bounded k-element heap per key instead —
  * O(n log k) per partition, O(k · #keys) memory, no sort buffer — and
  * the planner inserts a PARTIAL pass before the shuffle, so at
  * 100 TB the exchange carries at most k rows per key per map
  * partition instead of the whole table.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical bounded-heap top-k. `partial = true` runs before the
  * exchange (no distribution requirement, shrinks map output);
  * `partial = false` requires co-location by key and emits the final
  * per-key top-k, best-first.
  */
final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of keys"))

  private final class Entry(val ord: Double, val tieV: Long, val row: InternalRow)

  // Heap dequeues the WORST entry (lowest order, then highest tie).
  private object WorstFirst extends Ordering[Entry] {
    override def compare(x: Entry, y: Entry): Int = {
      val c = java.lang.Double.compare(y.ord, x.ord)
      if (c != 0) c else java.lang.Long.compare(x.tieV, y.tieV)
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExpr = order
    val tieExpr = tie
    val childOutput = child.output
    val outRowsMetric = longMetric("numOutputRows")
    val groupsMetric = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordBound = BindReferences.bindReference(orderExpr, childOutput)
      val tieBound = BindReferences.bindReference(tieExpr, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      iter.foreach { row =>
        val ordAny = ordBound.eval(row)
        if (ordAny != null) {
          val ordV = ordAny.asInstanceOf[Double]
          val tieAny = tieBound.eval(row)
          val tieV = if (tieAny == null) Long.MaxValue else tieAny.asInstanceOf[Long]
          val key = keyProj(row)
          // copy the key only on first insertion, not per row
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[Entry](WorstFirst)
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kLocal) {
            heap.enqueue(new Entry(ordV, tieV, row.copy()))
          } else {
            val worst = heap.head
            // Double.compare (not primitive >) so NaN ranks greatest
            // consistently with both the heap ordering and Spark's
            // descending sort - results stay arrival-order-independent
            val cmp = java.lang.Double.compare(ordV, worst.ord)
            if (cmp > 0 || (cmp == 0 && tieV < worst.tieV)) {
              heap.dequeue()
              heap.enqueue(new Entry(ordV, tieV, row.copy()))
            }
          }
        }
      }
      // Emit best-first per key for deterministic downstream order.
      groupsMetric += heaps.size
      heaps.iterator.flatMap { case (_, heap) =>
        val worstFirst: Seq[Entry] = heap.dequeueAll
        outRowsMetric += worstFirst.size
        worstFirst.reverseIterator.map(e => e.row)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as partial-then-final (the exchange between
  * them is inserted by EnsureRequirements from the final node's
  * required distribution).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, tie, k, child) =>
      val planned = planLater(child)
      TopKPerKeyExec(keys, order, tie, k, partial = false,
        TopKPerKeyExec(keys, order, tie, k, partial = true, planned)) :: Nil
    case _ => Nil
  }
}

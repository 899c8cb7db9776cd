package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** How a NULL `order` value ranks. [[TopKNullRank.Drop]] is the DSL
  * default (a top-k by a missing score has no business keeping the
  * row); Best/Worst reproduce SQL NULLS FIRST / NULLS LAST so the
  * optimizer rewrite ([[InferTopKPerKey]]) can match window-sort
  * semantics exactly.
  */
sealed trait TopKNullRank
object TopKNullRank {
  case object Drop extends TopKNullRank
  case object Best extends TopKNullRank
  case object Worst extends TopKNullRank
}

/** Logical per-key top-k: keep the k best rows per key. By default
  * (the [[GraftOps.topKPerKey]] DSL) "best" = highest `order`
  * (DoubleType), ties broken by lowest `tie` (LongType), NULL orders
  * DROPPED, NaN orders ranking greatest (matching Spark's descending
  * sort).
  *
  * The extra flags generalize the ranking so the window idiom
  * `row_number().over(partitionBy.orderBy) <= k` can be rewritten to
  * this node with identical semantics ([[InferTopKPerKey]]):
  * `ordAsc` flips direction (smallest wins), `ordLong` compares the
  * order as an exact Long (a 60-bit hash loses low bits in double
  * space — two hashes closer than 1 ulp would otherwise fall through
  * to the tie-break, diverging from the window sort at corpus scale),
  * `nullRank` maps the window's NULLS FIRST/LAST, and `tieNullsFirst`
  * does the same for the tie column. `distinctOrd` (r17) keeps at most
  * ONE row per (order, tie) rank per key — the k-minimum-values sketch
  * shape: the k best DISTINCT rank values fold map-side in the partial
  * pass, so a KMV consumer needs NO full-stream dropDuplicates
  * exchange before the heap (each partition's k distinct minima are a
  * superset of that partition's contribution to the global k).
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
    child: LogicalPlan,
    ordAsc: Boolean = false,
    ordLong: Boolean = false,
    nullRank: TopKNullRank = TopKNullRank.Drop,
    tieNullsFirst: Boolean = false,
    distinctOrd: Boolean = false) extends UnaryNode {
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
    child: SparkPlan,
    ordAsc: Boolean = false,
    ordLong: Boolean = false,
    nullRank: TopKNullRank = TopKNullRank.Drop,
    tieNullsFirst: Boolean = false,
    distinctOrd: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // row-selection only — the child's partitioning survives, so a
  // downstream operator clustered on the same keys (e.g. the Window
  // the InferTopKPerKey rewrite leaves on top) needs no new exchange
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of keys"))

  // ordD is used when !ordLong, ordL when ordLong; nullOrd marks a
  // NULL order value kept under Best/Worst ranking.
  private final class Entry(
      val nullOrd: Boolean, val ordD: Double, val ordL: Long,
      val tieV: Long, val row: InternalRow)

  private val nullIsBest = nullRank == TopKNullRank.Best
  private val tieForNull = if (tieNullsFirst) Long.MinValue else Long.MaxValue

  /** +1 if x ranks worse than y, -1 better, 0 tied on (order, tie). */
  private def cmpWorse(
      xNull: Boolean, xD: Double, xL: Long, xTie: Long, y: Entry): Int = {
    val base =
      if (xNull && y.nullOrd) 0
      else if (xNull) { if (nullIsBest) -1 else 1 }
      else if (y.nullOrd) { if (nullIsBest) 1 else -1 }
      else {
        val c =
          if (ordLong) java.lang.Long.compare(xL, y.ordL)
          // Double.compare (not primitive >) so NaN ranks greatest
          // consistently with both the heap ordering and Spark's
          // sort - results stay arrival-order-independent
          else java.lang.Double.compare(xD, y.ordD)
        if (ordAsc) c else -c
      }
    if (base != 0) base else java.lang.Long.compare(xTie, y.tieV)
  }

  // Heap dequeues the WORST entry.
  private object WorstFirst extends Ordering[Entry] {
    override def compare(x: Entry, y: Entry): Int =
      cmpWorse(x.nullOrd, x.ordD, x.ordL, x.tieV, y)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExpr = order
    val tieExpr = tie
    val childOutput = child.output
    val dropNulls = nullRank == TopKNullRank.Drop
    val isLong = ordLong
    val nullTie = tieForNull
    val dedup = distinctOrd
    val outRowsMetric = longMetric("numOutputRows")
    val groupsMetric = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordBound = BindReferences.bindReference(orderExpr, childOutput)
      val tieBound = BindReferences.bindReference(tieExpr, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      // distinctOrd: per-key identity set of (nullOrd, ord, tie) so
      // rows ranking EQUAL occupy one heap slot; kept in lockstep with
      // the heap (insert adds, eviction removes). Identity packs the
      // rank triple — doubles by raw bits, exact under the same
      // Double.compare the heap uses (NaN == NaN by bits here, which
      // matches NaN ranking as one value in the sort order).
      val seen =
        if (dedup) mutable.HashMap.empty[UnsafeRow, mutable.HashSet[(Boolean, Long, Long)]]
        else null
      iter.foreach { row =>
        val ordAny = ordBound.eval(row)
        if (ordAny != null || !dropNulls) {
          val isNull = ordAny == null
          val ordD = if (isNull || isLong) 0.0 else ordAny.asInstanceOf[Double]
          val ordL = if (isNull || !isLong) 0L else ordAny.asInstanceOf[Long]
          val tieAny = tieBound.eval(row)
          val tieV = if (tieAny == null) nullTie else tieAny.asInstanceOf[Long]
          val key = keyProj(row)
          // copy the key only on first insertion, not per row
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[Entry](WorstFirst)
              heaps.put(key.copy(), h)
              h
          }
          val ident: (Boolean, Long, Long) =
            if (dedup)
              (isNull,
                if (isLong) ordL else java.lang.Double.doubleToRawLongBits(ordD),
                tieV)
            else null
          val idSet =
            if (dedup) {
              seen.get(key) match {
                case Some(s) => s
                case None =>
                  val s = mutable.HashSet.empty[(Boolean, Long, Long)]
                  seen.put(key.copy(), s)
                  s
              }
            } else null
          if (!dedup || !idSet.contains(ident)) {
            if (heap.size < kLocal) {
              heap.enqueue(new Entry(isNull, ordD, ordL, tieV, row.copy()))
              if (dedup) { idSet += ident; () }
            } else if (cmpWorse(isNull, ordD, ordL, tieV, heap.head) < 0) {
              val evicted = heap.dequeue()
              if (dedup) {
                idSet -= ((evicted.nullOrd,
                  if (isLong) evicted.ordL
                  else java.lang.Double.doubleToRawLongBits(evicted.ordD),
                  evicted.tieV))
                idSet += ident
                ()
              }
              heap.enqueue(new Entry(isNull, ordD, ordL, tieV, row.copy()))
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
    case t: TopKPerKey =>
      val planned = planLater(t.child)
      TopKPerKeyExec(t.keys, t.order, t.tie, t.k, partial = false,
        TopKPerKeyExec(t.keys, t.order, t.tie, t.k, partial = true, planned,
          t.ordAsc, t.ordLong, t.nullRank, t.tieNullsFirst, t.distinctOrd),
        t.ordAsc, t.ordLong, t.nullRank, t.tieNullsFirst, t.distinctOrd) :: Nil
    case _ => Nil
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical broadcast interval-stab join (inner): for every left
  * ("point") row, attach every right ("interval") row whose
  * [start, end] range contains the point (both bounds inclusive).
  *
  * Spark has no native range-join operator — a `BETWEEN` predicate
  * with no equi-key plans as a BroadcastNestedLoopJoin that scans the
  * ENTIRE broadcast side for every probe row, O(n·m). The declarative
  * workaround (`q_range_join`'s bin-explode rewrite) needs a bounded
  * interval length to pick a bin width. This operator needs neither:
  * the broadcast intervals are sorted by start once per partition and
  * each probe is a binary search plus a walk-back pruned by a prefix
  * running-max of `end` — O(log m + hits) per probe row, arbitrary
  * interval lengths, overlapping/nested/duplicate intervals included.
  *
  * Contract: `point`/`start`/`end` are LongType (cast in the API).
  * NULL points and NULL-bounded intervals never match (SQL comparison
  * semantics); empty intervals (start > end) match nothing. The
  * interval side must be broadcast-sized — it is collected to every
  * executor (same budget as any broadcast join build side).
  */
final case class RangeJoin(
    point: Expression,
    start: Expression,
    end: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical broadcast interval-stab join. The right child is broadcast
  * (EnsureRequirements inserts the BroadcastExchange from the declared
  * distribution); each probe partition sorts the interval array by
  * start ONCE, precomputes the prefix running-max of end, and serves
  * every probe with binary search + pruned walk-back:
  * prefixMaxEnd(i) < t proves no interval at index <= i can contain t,
  * so the walk-back stops at the first pruned prefix instead of
  * scanning all earlier starts.
  */
final case class RangeJoinExec(
    point: Expression,
    start: Expression,
    end: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numIntervals" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "broadcast intervals (non-null, non-empty)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val pointExpr = point
    val startExpr = start
    val endExpr = end
    val lOutput = left.output
    val rOutput = right.output
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val nIntervals = longMetric("numIntervals")
    val exprKey = (startExpr.semanticHash(), endExpr.semanticHash())
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      // The sorted index over the broadcast side is built ONCE per
      // executor (memoized weakly on the broadcast value) — a 5M-
      // interval build side probed by 2000 partitions would otherwise
      // pay 2000 O(m log m) sorts per executor lifetime.
      val (starts, prefixMaxEnd, ivs) =
        RangeJoinExec.index(bcast.value, exprKey, { rows =>
          val startBound = BindReferences.bindReference(startExpr, rOutput)
          val endBound = BindReferences.bindReference(endExpr, rOutput)
          // (start, end, row), NULL/empty intervals dropped, sorted
          // by start
          val built = rows.flatMap { r =>
            val s = startBound.eval(r)
            val e = endBound.eval(r)
            if (s == null || e == null) None
            else {
              val sl = s.asInstanceOf[Long]
              val el = e.asInstanceOf[Long]
              if (sl > el) None else Some((sl, el, r))
            }
          }.sortBy(iv => (iv._1, iv._2))
          val st = built.map(_._1)
          val pme = new Array[Long](built.length)
          var i = 0
          var runMax = Long.MinValue
          while (i < built.length) {
            if (built(i)._2 > runMax) runMax = built(i)._2
            pme(i) = runMax
            i += 1
          }
          (st, pme, built)
        })
      // one representative task reports the build size (the merge sums
      // per-task contributions, so a per-partition set would multiply)
      if (org.apache.spark.TaskContext.getPartitionId() == 0) {
        nIntervals.add(ivs.length.toLong)
      }

      val pointBound = BindReferences.bindReference(pointExpr, lOutput)
      val resultProj = UnsafeProjection.create(outAttrs, lOutput ++ rOutput)
      val joined = new JoinedRow

      /** greatest index with starts(idx) <= t, or -1. */
      def upperBound(t: Long): Int = {
        var lo = 0
        var hi = starts.length - 1
        var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (starts(mid) <= t) { ans = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        ans
      }

      lIter.flatMap { lRow =>
        val tAny = pointBound.eval(lRow)
        if (tAny == null) Iterator.empty
        else {
          val t = tAny.asInstanceOf[Long]
          var idx = upperBound(t)
          val hits = Iterator.unfold(idx) { j =>
            if (j < 0 || prefixMaxEnd(j) < t) None
            else Some((j, j - 1))
          }.filter(j => ivs(j)._2 >= t)
          hits.map { j =>
            outRows += 1
            resultProj(joined(lRow, ivs(j)._3))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoinExec {

  private type Built =
    (Array[Long], Array[Long], Array[(Long, Long, InternalRow)])

  // Executor-level memo of the sorted interval index: WEAK outer key
  // on the broadcast value array (the entry dies with the broadcast
  // block — no leak past the query), inner key on the semantic hash
  // of the (start, end) expressions so two range joins broadcasting
  // the same relation with different bounds don't collide.
  private val cache =
    new java.util.WeakHashMap[Array[InternalRow],
      java.util.concurrent.ConcurrentHashMap[(Int, Int), Built]]()

  private[plans] def index(rows: Array[InternalRow], key: (Int, Int),
      build: Array[InternalRow] => Built): Built = {
    val inner = cache.synchronized {
      var m = cache.get(rows)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Built]()
        cache.put(rows, m)
      }
      m
    }
    inner.computeIfAbsent(key, _ => build(rows))
  }
}

/** Plans the logical range join; the broadcast exchange comes from
  * EnsureRequirements.
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(p, s, e, l, r) =>
      RangeJoinExec(p, s, e, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

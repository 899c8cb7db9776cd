package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical as-of join (left outer): for every left row, attach the
  * single right row with the same key whose time is the greatest one
  * <= the left row's time; right columns are NULL when no such row
  * exists.
  *
  * Spark has no native as-of join — a range predicate plans as a
  * BroadcastNestedLoopJoin (per-row scans of the right side), and the
  * declarative workaround (union the tagged sides + last-ignoreNulls
  * over an ordered window, `graft.operators.Temporal.asofJoin`) pays a
  * union + full-width window pass. This operator is the direct shape:
  * co-partition both sides by key, sort each partition by (key, time),
  * and resolve every left row in ONE forward merge pass — O(n_l + n_r)
  * per partition, no window buffer, no nested loop. The exchanges and
  * sorts are inserted by EnsureRequirements from the declared
  * distribution/ordering, so AQE still plans/coalesces them normally.
  *
  * Contract: `leftTime`/`rightTime` are LongType (cast in the API);
  * rows with duplicate (key, time) on the RIGHT side resolve to the
  * last one in sort order — pre-aggregate the right side when that
  * matters (the reference query collapses clicks per (user, ms)
  * first). Null keys compare like values (sort-order semantics), so
  * null-keyed left rows match null-keyed right rows — filter them
  * beforehand for SQL-equality semantics. NULL TIMES never match
  * (SQL comparison semantics): a NULL-time left row emits the
  * null-extended result, and NULL-time right rows are skipped.
  */
final case class AsofJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge as-of join. Both children are hash-clustered on
  * their keys and sorted by (keys..., time), so each partition is a
  * key-contiguous time-ordered run on both sides and one forward scan
  * of the right side serves all left rows.
  */
final case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with a match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lOutput = left.output
    val rOutput = right.output
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lTimeBound = BindReferences.bindReference(lTime, lOutput)
      val rTimeBound = BindReferences.bindReference(rTime, rOutput)
      // bind against NULLABLE right attributes: the right child's
      // schema may declare them non-null, but the no-match case feeds
      // an all-null row through the projection
      val resultProj = UnsafeProjection.create(
        outAttrs, lOutput ++ rOutput.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOutput.size)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // Latest right row at/before the current merge frontier, valid
      // only while its key equals the left key being probed.
      var lastKey: InternalRow = null
      var lastRow: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTAny = lTimeBound.eval(lRow)
        if (lTAny == null) {
          // NULL left time: "at or before NULL" matches nothing
          // (SQL comparison semantics, not a coerced 0)
          outRows += 1
          resultProj(joined(lRow, nullRight))
        } else {
          val lT = lTAny.asInstanceOf[Long]
          // advance the right side through (key < lKey) and
          // (key == lKey && time <= lT)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              rBuf.next() // behind the probe key: discard
            } else if (c == 0) {
              val rTAny = rTimeBound.eval(rRow)
              if (rTAny == null) {
                rBuf.next() // NULL right time can never be a match
              } else if (rTAny.asInstanceOf[Long] <= lT) {
                lastKey = rKey.copy()
                lastRow = rBuf.next().copy()
              } else {
                advancing = false
              }
            } else {
              advancing = false
            }
          }
          outRows += 1
          if (lastRow != null && lastKey != null && keyOrd.compare(lastKey, lKey) == 0) {
            matched += 1
            resultProj(joined(lRow, lastRow))
          } else {
            resultProj(joined(lRow, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical as-of join; exchanges/sorts come from
  * EnsureRequirements.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(lk, rk, lt, rt, l, r) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rewrite of the per-group top-k window idiom.
  *
  * `Filter(rn <= k, Window(row_number() AS rn, partitionBy p orderBy o))`
  * computes rn for EVERY row — a full shuffle of the table plus a full
  * sort of every group — only to discard all but k rows per key. This
  * rule rewrites the pattern to
  *
  * `Window(row_number() AS rn, ..., TopKPerKey(p, o, k))`
  *
  * i.e. the bounded-heap partial/final [[TopKPerKey]] operator feeds
  * the window: the exchange now carries at most k rows per key per map
  * partition, and the window's sort runs over <= k rows per key. The
  * filter is dropped — every surviving row has rn <= k by
  * construction — which also keeps Spark's own InferWindowGroupLimit
  * (sort-based, map-side full sort) from matching afterwards. The
  * window itself stays so the rank column keeps its exact values for
  * downstream consumers.
  *
  * The rewrite fires only when it is provably semantics-preserving:
  *  - the window computes exactly one expression, a `row_number()`
  *    (rank/dense_rank keep ties past k — a bounded heap cannot);
  *  - the filter is a sole `rn <= k` / `rn < k` / `rn = 1` comparison
  *    against an integer literal (casts around rn are looked through),
  *    1 <= k <= 10000 (bounds heap memory at k rows x keys per task);
  *  - there is a partition spec (a global top-k needs a different
  *    single-reduce shape);
  *  - the ordering is 1-2 columns of integral/floating type: the
  *    primary carries direction + NULLS FIRST/LAST into the operator's
  *    flags (Long orders compare exactly — no double rounding), the
  *    optional secondary must be an ascending integral tie-break.
  *
  * Registered both via [[graft.GraftExtensions]] (operator-optimization
  * batch, runs before InferWindowGroupLimit) and at runtime through
  * `experimental.extraOptimizations` (runs after it — any
  * already-inserted WindowGroupLimit below the window is subsumed and
  * stripped).
  */
object InferTopKPerKey extends Rule[LogicalPlan] {

  private val MaxK = 10000

  /** cond is a lone comparison of the rank attribute against an int
    * literal; returns the implied k.
    */
  private def impliedK(cond: Expression, rn: Attribute): Option[Int] = {
    def isRn(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == rn.exprId
      case Cast(inner, LongType | IntegerType, _, _) => isRn(inner)
      case _ => false
    }
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(l, r) if isRn(l) => lit(r).map(_.min(Int.MaxValue).toInt)
      case GreaterThanOrEqual(l, r) if isRn(r) => lit(l).map(_.min(Int.MaxValue).toInt)
      case LessThan(l, r) if isRn(l) => lit(r).map(v => (v - 1).min(Int.MaxValue).toInt)
      case GreaterThan(l, r) if isRn(r) => lit(l).map(v => (v - 1).min(Int.MaxValue).toInt)
      case EqualTo(l, r) if isRn(l) && lit(r).contains(1L) => Some(1)
      case EqualTo(l, r) if isRn(r) && lit(l).contains(1L) => Some(1)
      case _ => None
    }
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Translate the window's orderSpec into TopKPerKey's (order, tie,
    * flags); None when the spec is outside the provable subset.
    */
  private def translate(orderSpec: Seq[SortOrder])
      : Option[(Expression, Expression, Boolean, Boolean, TopKNullRank, Boolean)] = {
    if (orderSpec.isEmpty || orderSpec.size > 2) return None
    val primary = orderSpec.head
    val (ordExpr, ordLong) = primary.child.dataType match {
      case LongType => (primary.child, true)
      case t if integral(t) => (Cast(primary.child, LongType), true)
      case DoubleType => (primary.child, false)
      case FloatType => (Cast(primary.child, DoubleType), false)
      case _ => return None
    }
    val ordAsc = primary.direction == Ascending
    val nullRank =
      if (!primary.child.nullable) TopKNullRank.Worst
      else if (primary.nullOrdering == NullsFirst) TopKNullRank.Best
      else TopKNullRank.Worst
    val tie = orderSpec.lift(1) match {
      case None => Some((Literal(0L), false))
      case Some(SortOrder(t, Ascending, no, _)) if integral(t.dataType) =>
        val tieExpr = if (t.dataType == LongType) t else Cast(t, LongType)
        Some((tieExpr, no == NullsFirst))
      case _ => None
    }
    tie.map { case (tieExpr, tieNullsFirst) =>
      (ordExpr, tieExpr, ordAsc, ordLong, nullRank, tieNullsFirst)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, inner, _)) if partitionSpec.nonEmpty =>
      (impliedK(cond, a.toAttribute), translate(orderSpec)) match {
        case (Some(k), Some((ord, tie, ordAsc, ordLong, nullRank, tieNf)))
            if k >= 1 && k <= MaxK =>
          // a WindowGroupLimit Spark already inserted is subsumed
          val child = inner match {
            case wgl: WindowGroupLimit => wgl.child
            case other => other
          }
          w.copy(child = TopKPerKey(
            partitionSpec, ord, tie, k, child,
            ordAsc, ordLong, nullRank, tieNf))
        case _ => f
      }
  }
}

package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.Bridge

/** DataFrame-level API for graft's custom operators. */
object GraftOps {

  /** Opt a session into graft's planner extensions at runtime: the
    * custom-operator strategies plus the [[InferTopKPerKey]] rewrite
    * (row_number-filter top-k idiom → bounded-heap TopKPerKey). The
    * same set is installed declaratively by
    * `spark.sql.extensions=graft.GraftExtensions`; this entry point
    * covers sessions built without the config. Idempotent.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.addStrategy(spark, TopKStrategy)
    Bridge.addStrategy(spark, AsofJoinStrategy)
    Bridge.addStrategy(spark, RangeJoinStrategy)
    Bridge.addOptimization(spark, InferTopKPerKey)
  }

  /** Per-key top-k without a window sort: keep the `k` rows with the
    * highest `order` per `keys` group, ties broken by the lowest
    * `tie`. NULL-order rows are dropped; NaN orders rank greatest
    * (Spark descending-sort semantics). Plans as partial
    * (pre-shuffle) + final bounded-heap passes — see [[TopKPerKey]].
    *
    * Also registered by [[graft.GraftExtensions]]; this API
    * additionally self-registers the strategy so it works on any
    * session.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Column,
      tie: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    Bridge.addStrategy(spark, TopKStrategy)
    // Integral orders compare as exact Longs: a blanket double cast
    // collapses 64-bit values closer than 1 ulp (53 mantissa bits),
    // and e.g. a 60-bit hash order would fall through to the
    // tie-break — the corpus-scale divergence TopKPerKey.ordLong
    // exists to prevent. Fractional orders keep the double path.
    val ordIsLong = df.select(order).schema.head.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    Bridge.ofRows(spark, TopKPerKey(
      keys.map(Bridge.eagerExpression),
      Bridge.eagerExpression(
        if (ordIsLong) order.cast("long") else order.cast("double")),
      Bridge.eagerExpression(tie.cast("long")),
      k,
      Bridge.logicalPlan(df),
      ordLong = ordIsLong))
  }

  /** Partition-skew diagnostic: per-partition row counts of `df` AS
    * CURRENTLY PARTITIONED, one output row per non-empty partition.
    * The skew ratio (max/mean) is the number that predicts straggler
    * tasks at scale; [[skewRatio]] computes it directly. Cost: one
    * narrow pass + a tiny aggregate — safe to run on any intermediate.
    */
  def partitionStats(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** max/mean rows per partition (1.0 = perfectly balanced; empty
    * input returns 0). Values far above ~2 mean a hot key or bad
    * partitioning is concentrating work on straggler tasks.
    */
  def skewRatio(df: DataFrame): Double = {
    val stats = partitionStats(df).collect().map(_.getLong(1))
    if (stats.isEmpty) 0.0
    else stats.max.toDouble / (stats.sum.toDouble / stats.length)
  }

  /** As-of join (left outer): for each `left` row, the `right` row
    * with equal keys and the greatest `rightTime` <= `leftTime`;
    * right columns NULL when none exists. Executes as a co-partitioned
    * single-pass sort-merge — see [[AsofJoin]] for semantics and the
    * comparison with the union-window formulation.
    *
    * `left` and `right` must not share attribute lineage (build the
    * sides from separate reads or alias the columns apart), and time
    * columns are cast to LongType.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "asofJoin needs matching non-empty key lists")
    // Key types must match EXACTLY: the co-partitioning hashes each
    // side's own keys, and Murmur3 hashes Int 5 and Long 5 to
    // different values — mismatched types would silently land equal
    // keys in different partitions and null-extend every left row.
    // The key ordering is also built from left types only.
    val lt = left.select(leftKeys: _*).schema.map(_.dataType)
    val rt = right.select(rightKeys: _*).schema.map(_.dataType)
    require(lt == rt,
      s"asofJoin key type mismatch: left ${lt.mkString("(", ",", ")")} vs " +
        s"right ${rt.mkString("(", ",", ")")} — cast the keys to one type " +
        "(equal keys would otherwise hash to different partitions and " +
        "silently never match)")
    val spark = left.sparkSession
    Bridge.addStrategy(spark, AsofJoinStrategy)
    Bridge.ofRows(spark, AsofJoin(
      leftKeys.map(Bridge.eagerExpression),
      rightKeys.map(Bridge.eagerExpression),
      Bridge.eagerExpression(leftTime.cast("long")),
      Bridge.eagerExpression(rightTime.cast("long")),
      Bridge.logicalPlan(left),
      Bridge.logicalPlan(right)))
  }

  /** Interval-stab join (inner): for each `points` row, every
    * `intervals` row whose [start, end] contains `point` (inclusive).
    * The interval side is broadcast and probed by binary search —
    * O(log m + hits) per probe instead of the BroadcastNestedLoopJoin
    * full scan a raw BETWEEN predicate plans to, with no bounded-
    * interval-length assumption (unlike the bin-explode rewrite).
    * See [[RangeJoin]] for NULL/empty-interval semantics.
    *
    * `points` and `intervals` must not share attribute lineage;
    * `point`/`start`/`end` are cast to LongType.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      point: Column, start: Column, end: Column): DataFrame = {
    val spark = points.sparkSession
    Bridge.addStrategy(spark, RangeJoinStrategy)
    Bridge.ofRows(spark, RangeJoin(
      Bridge.eagerExpression(point.cast("long")),
      Bridge.eagerExpression(start.cast("long")),
      Bridge.eagerExpression(end.cast("long")),
      Bridge.logicalPlan(points),
      Bridge.logicalPlan(intervals)))
  }
}

package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.Bridge

/** DataFrame-level API for graft's custom operators. */
object GraftOps {

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
    Bridge.ofRows(spark, TopKPerKey(
      keys.map(Bridge.eagerExpression),
      Bridge.eagerExpression(order.cast("double")),
      Bridge.eagerExpression(tie.cast("long")),
      k,
      Bridge.logicalPlan(df)))
  }
}

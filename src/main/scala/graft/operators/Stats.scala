package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution statistics: histograms and exact percentiles.
  *
  * Percentiles use the explicit order-statistic formulation
  * (row_number selection at ceil(p*n)) instead of each engine's
  * `percentile`/`quantile` builtins, whose interpolation rules differ —
  * the explicit form is engine-independent AND is the shape that
  * scales (one shuffle on the group key; no global collect).
  */
object Stats {

  val histogram = QueryDef(
    "q_histogram",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(floor(col("value") / 10.0).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n"),
          graft.Det.sumd(col("value")).as("sum_value"))
        .orderBy("bucket")
    },
    Some(s"""SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
      COUNT(*) AS n, ${graft.Det.dsum("value")} AS sum_value
    FROM events GROUP BY 1 ORDER BY bucket"""))

  /** Exact p50/p90/p99 of `value` per event type via order statistics:
    * the element at row ceil(p*n) in (value, event_id) order.
    */
  val percentiles = QueryDef(
    "q_percentiles",
    (s, d) => {
      val wOrder = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      val wAll = Window.partitionBy("event_type")
      def pick(p: Double) =
        max(when(col("rn") === ceil(col("n") * p).cast(LongType), col("value")))
          .as(s"p${(p * 100).toInt}")
      Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(wOrder).cast(LongType))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("event_type")
        .agg(max(col("n")).as("n_events"), pick(0.5), pick(0.9), pick(0.99))
        .orderBy("event_type")
    },
    Some("""WITH ranked AS (
      SELECT event_type, value,
        CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type, max(n) AS n_events,
      max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50,
      max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90,
      max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS p99
    FROM ranked GROUP BY event_type ORDER BY event_type"""))

  val defs: Seq[QueryDef] = Seq(histogram, percentiles)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime skew-join handling — the OTHER half of the skew story:
  * `q_join_salted`/`agg_type_counts_salted` show MANUAL salting (the
  * shape to reach for when the hot keys are known), this spec proves
  * the RUNTIME path a 100-TB deployment leans on for UNKNOWN skew:
  * AQE detects the oversized shuffle partition at execution time and
  * splits it across tasks (`skew=true` on the join node), with no
  * query rewrite at all. Thresholds are lowered to fire at test scale;
  * production uses the defaults (5x median, 256 MB).
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a runtime-skewed sort-merge join partition") {
    TestSpark.withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 90% of the fact rows pile on key 0 — one shuffle partition
      // carries ~9x the median and AQE must split it
      val fact = spark.range(0, 200000)
        .select(col("id"),
          when(col("id") % 10 < 9, 0L).otherwise(col("id") % 97).as("k"),
          (col("id") * 7).as("payload"))
      val dim = spark.range(0, 97).select(col("id").as("k"), lit("d").as("tag"))
      val joined = fact.join(dim, "k")
      // run THIS dataset (count() would execute a column-pruned
      // sibling plan and leave joined's own AQE plan unfinalized)
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("skew=true"),
        s"AQE should mark the skewed join for runtime splitting:\n$plan")
    }
  }
}

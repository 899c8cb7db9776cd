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

  test("AQE splits a skewed documents join — real text payloads, byte-based detection") {
    // §8's scale-rehearsal item: the synthetic-range test above proves
    // the mechanism; this one proves it on the actual documents table,
    // where skew detection is BYTE-driven (wide text rows, not row
    // counts) — the shape a 100-TB corpus with a hot domain produces.
    TestSpark.withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // sf0.01's hot domain carries ~135 KB of raw text; shuffle
      // blocks are lz4-compressed, so the fixture threshold sits well
      // under that (production keeps the 256 MB default; only the
      // scale of the fixture changes here)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.01")
        // sf0.01 is a single parquet file = ONE map task, and AQE
        // splits a skewed reduce partition at MAP-OUTPUT granularity —
        // one mapper leaves nothing to split by. Spread the scan the
        // way any real multi-file table arrives (a 100-TB table has
        // thousands of input splits)
        .repartition(8)
        // a hot "domain": 90% of documents (and ~90% of text bytes)
        // share one join key, the rest spread across real languages
        .withColumn("domain",
          when(col("doc_id") % 10 < 9, lit("hot.example"))
            .otherwise(concat(lit("site-"), col("lang"))))
      // PLANNING LESSON (locked by this test): OptimizeSkewedJoin only
      // splits an SMJ whose children are Sort-over-ShuffleStage. A dim
      // AGGREGATED from the fact table on the join key arrives already
      // co-partitioned — its final agg sits between the sort and the
      // shuffle stage, the pattern doesn't match, and the skew silently
      // goes unsplit (an explicit .repartition(key) doesn't help: the
      // optimizer collapses it as redundant). Materializing the dim
      // (here localCheckpoint; production: a written dim table) forces
      // a fresh exchange under the join and restores the skew path —
      // the co-partitioning "optimization" costs you the split.
      val dim = docs.groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .localCheckpoint()
      val joined = docs.join(dim, "domain")
        .select("doc_id", "domain", "text", "n_docs", "chars")
      val rows = joined.collect()
      assert(rows.length == docs.count(),
        "inner join on a total dim must preserve every document")
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("skew=true"),
        s"AQE should split the hot-domain partition at runtime:\n$plan")
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned join (SPJ): two V2 scans reporting compatible
  * KeyGroupedPartitioning on the join key must plan a fact-fact
  * equi-join with ZERO Exchange nodes. The negative control proves the
  * partitioning report (gated by spark.sql.sources.v2.bucketing
  * .enabled) is what saves the shuffle, not table size or AQE luck.
  */
class SpjSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def spjRead(rows: Int, buckets: Int): DataFrame =
    spark.read.format("graft.sources.SpjEventsDataSource")
      .option("rows", rows).option("buckets", buckets).load()

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit =
    TestSpark.withConfs(confs: _*)(body)

  /** Final (post-AQE) plan string of an executed join. */
  private def executedPlan(df: DataFrame): String = {
    df.count() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("fact-fact equi-join over two SPJ scans plans with zero exchanges") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spjRead(800, 8)
      val b = spjRead(400, 8)
      val j = a.join(b.withColumnRenamed("event_id", "b_event_id")
          .withColumnRenamed("ts_ms", "b_ts_ms")
          .withColumnRenamed("event_type", "b_event_type")
          .withColumnRenamed("value", "b_value"),
        "user_id")
      val plan = executedPlan(j)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"SPJ join must not shuffle or broadcast:\n$plan")
      // per-user counts: 800/8=100 on a, 400/8=50 on b -> 8 * 100*50
      assert(j.count() === 8L * 100 * 50)
    }
  }

  test("negative control: without v2 bucketing the same join shuffles") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spjRead(800, 8).select("event_id", "user_id")
        .join(spjRead(400, 8).select(col("event_id").as("b_event_id"),
          col("user_id")), "user_id")
      val plan = executedPlan(j)
      assert(plan.contains("Exchange"),
        s"control join should shuffle when SPJ is disabled:\n$plan")
    }
  }

  test("partition-grouped generation matches the flat generator contract") {
    // every row's user_id must equal its bucket (the layout contract),
    // ids must cover exactly [0, rows), and pruning must reach the scan
    val df = spjRead(1000, 7)
    val rows = df.collect()
    assert(rows.length === 1000)
    assert(rows.forall(r => r.getLong(2) === r.getLong(0) % 7))
    assert(rows.map(_.getLong(0)).sorted.toSeq === (0L until 1000L))
    val pruned = spjRead(1000, 7).select("value")
    val scanLine = pruned.queryExecution.executedPlan.toString
    assert(scanLine.contains("readSchema=value"), scanLine)
  }
}

package graft

import graft.plans.GraftOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PartitionStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitionStats accounts for every row exactly once") {
    val df = spark.range(10000).toDF().repartition(8)
    val stats = GraftOps.partitionStats(df).collect()
    assert(stats.map(_.getLong(1)).sum == 10000L)
    assert(stats.length <= 8)
  }

  test("skewRatio is ~1 on balanced data and large on a hot key") {
    val balanced = spark.range(10000).toDF().repartition(8, col("id"))
    assert(GraftOps.skewRatio(balanced) < 1.5)
    // 95% of rows share one key -> one partition holds almost all rows
    val hot = spark.range(10000)
      .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id")).as("k"))
      .repartition(8, col("k"))
    assert(GraftOps.skewRatio(hot) > 4.0)
    assert(GraftOps.skewRatio(spark.range(0).toDF()) == 0.0)
  }

  test("salted aggregation flattens the hot-key skew it documents") {
    // the agg_type_counts_salted pattern: pre-aggregating on
    // (key, salt) bounds any reducer's input by ~n/s for a hot key.
    // Salt count must comfortably exceed the partition count or the
    // (key, salt) groups themselves land unevenly (balls-in-bins).
    val hot = spark.range(10000)
      .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val unsalted = GraftOps.skewRatio(hot.repartition(8, col("k")))
    val salted = hot.withColumn("_salt", pmod(col("v"), lit(64)))
      .repartition(8, col("k"), col("_salt"))
    val saltedRatio = GraftOps.skewRatio(salted)
    assert(saltedRatio < 2.0,
      s"salting must spread the hot key across reducers (got $saltedRatio)")
    assert(saltedRatio < unsalted / 2,
      s"salting must clearly beat the unsalted layout ($saltedRatio vs $unsalted)")
  }
}

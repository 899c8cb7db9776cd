package graft

import graft.functions.WeightedMean
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WeightedMeanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("weighted mean over a DataFrame via udaf()") {
    import spark.implicits._
    val df = Seq((1.0, 1.0), (3.0, 3.0)).toDF("v", "w")
    val got = df.agg(udaf(WeightedMean).apply(col("v"), col("w")).as("wm"))
      .collect().head.getDouble(0)
    assert(math.abs(got - 2.5) < 1e-12) // (1*1 + 3*3) / 4
  }

  test("partitions merge correctly") {
    import spark.implicits._
    val df = spark.range(1000).repartition(7)
      .select(col("id").cast("double").as("v"), lit(2.0).as("w"))
    val got = df.agg(udaf(WeightedMean).apply(col("v"), col("w")))
      .collect().head.getDouble(0)
    assert(math.abs(got - 499.5) < 1e-9)
  }
}

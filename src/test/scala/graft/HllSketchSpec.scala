package graft

import graft.functions.HllSketchAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def estimate(df: org.apache.spark.sql.DataFrame, c: String): Long =
    df.agg(HllSketchAgg.approxDistinct(col(c)).as("e")).collect().head.getLong(0)

  test("estimate is within the HLL error bound across cardinalities") {
    // p=12 -> standard error 1.04/sqrt(4096) ~ 1.63%; assert 5 sigma.
    for (n <- Seq(100L, 10000L, 200000L)) {
      val df = spark.range(n).select(col("id"))
      val est = estimate(df, "id")
      val err = math.abs(est - n).toDouble / n
      assert(err < 5 * 0.0163, s"n=$n est=$est err=$err")
    }
  }

  test("small cardinalities are exact via linear counting") {
    // with 4096 registers and 42 distinct values, collisions are rare
    // enough that linear counting returns the exact count
    val df = spark.range(42).select(col("id"))
    assert(estimate(df, "id") == 42L)
  }

  test("estimate is independent of partitioning (merge correctness)") {
    val base = spark.range(50000).select((col("id") % 7919).as("v"))
    val e1 = estimate(base.repartition(1), "v")
    val e32 = estimate(base.repartition(32, col("v")), "v")
    val eRand = estimate(base.repartition(13), "v")
    assert(e1 == e32 && e32 == eRand,
      s"estimates must not depend on partitioning: $e1 / $e32 / $eRand")
  }

  test("duplicates do not move the estimate") {
    val once = spark.range(5000).select(col("id"))
    val tripled = once.union(once).union(once)
    assert(estimate(once, "id") == estimate(tripled, "id"))
  }

  test("empty input estimates zero and nulls are ignored") {
    val empty = spark.range(0).select(col("id"))
    assert(estimate(empty, "id") == 0L)
    val withNulls = spark.range(100)
      .select(when(col("id") % 2 === 0, col("id")).as("v"))
    assert(estimate(withNulls, "v") == 50L)
  }

  test("q_approx_distinct estimate tracks the exact count per group") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users")
      val exact = r.getAs[Long]("exact_users")
      assert(math.abs(approx - exact).toDouble / math.max(exact, 1) < 0.1,
        s"group ${r.get(0)}: approx=$approx exact=$exact")
    }
  }
}

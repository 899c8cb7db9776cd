package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LongArrayDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches the interpreted higher-order-function result") {
    import spark.implicits._
    val df = spark.range(100).select(
      transform(sequence(lit(1), lit(64)),
        i => pmod(xxhash64(col("id") * i), lit(1000L)) - 500L).as("a"),
      transform(sequence(lit(1), lit(64)),
        i => pmod(xxhash64(col("id") + i), lit(1000L)) - 500L).as("b"))
    val got = df.select(GraftFunctions.dotLong(col("a"), col("b")).as("d"))
      .as[Long].collect().toSeq
    val ref = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (s, v) => s + v).as("d"))
      .as[Long].collect().toSeq
    assert(got == ref)
  }

  test("is registered for SQL via GraftFunctions and GraftExtensions") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0)
    assert(r == 32L)
  }

  test("norm via self-dot") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(3L, 4L), array(3L, 4L)) AS d")
      .collect().head.getLong(0) == 25L)
  }
}

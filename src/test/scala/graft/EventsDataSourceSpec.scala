package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSource V2 connector: partition planning, column
  * pruning, and determinism.
  */
class EventsDataSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Fmt = "graft.sources.EventsDataSource"

  private def read(rows: Long, parts: Int) =
    spark.read.format(Fmt)
      .option("rows", rows).option("partitions", parts).load()

  test("generates exactly the requested rows across planned partitions") {
    val df = read(10000, 7)
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 7)
    // ids are a disjoint exact cover of [0, rows)
    assert(df.agg(countDistinct(col("event_id"))).head().getLong(0) == 10000)
    assert(df.agg(min("event_id"), max("event_id")).head() ==
      org.apache.spark.sql.Row(0L, 9999L))
  }

  test("rows are a pure function of the id (retry/replay safe)") {
    val a = read(500, 3).collect().sortBy(_.getLong(0))
    val b = read(500, 5).collect().sortBy(_.getLong(0))
    assert(a.toSeq == b.toSeq, "partitioning must not change row content")
  }

  test("column pruning reaches the scan (V2 pushdown)") {
    val df = read(100, 2).select("user_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("readSchema=user_id"),
      s"expected the scan to read only user_id:\n$scan")
    assert(df.distinct().count() <= 50)
  }

  test("an aggregate-only read plans an empty projection without error") {
    assert(read(1234, 4).groupBy().count().head().getLong(0) == 1234)
  }

  test("generated distributions look like the events table") {
    val df = read(5000, 4)
    val types = df.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == graft.sources.EventsDataSource.EventTypes.toSet)
    val users = df.select("user_id").distinct().count()
    assert(users == 50, s"expected the 50-user key space, got $users")
  }
}

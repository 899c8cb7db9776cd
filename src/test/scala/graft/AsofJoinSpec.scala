package graft

import graft.plans.GraftOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct tests of the custom co-partitioned sort-merge as-of join
  * ([[graft.plans.AsofJoin]]); the oracle-checked q_asof_join_custom
  * query is the cross-engine proof, these cover the edge semantics.
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(String, Long, Long)], right: Seq[(String, Long, Long)]) = {
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("rk", "rt", "rv")
    GraftOps.asofJoin(l, r, Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .select("k", "t", "lv", "rv")
      .collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .toSet
  }

  test("picks the most recent right row at or before each left time") {
    val out = run(
      left = Seq(("a", 10L, 1L), ("a", 25L, 2L), ("a", 30L, 3L)),
      right = Seq(("a", 5L, 100L), ("a", 20L, 200L), ("a", 30L, 300L)))
    assert(out == Set(
      ("a", 10L, 1L, Some(100L)),
      ("a", 25L, 2L, Some(200L)),
      ("a", 30L, 3L, Some(300L)))) // inclusive at equal time
  }

  test("left rows with no prior right row get NULL") {
    val out = run(
      left = Seq(("a", 1L, 1L), ("b", 50L, 2L)),
      right = Seq(("a", 10L, 100L)))
    assert(out == Set(("a", 1L, 1L, None), ("b", 50L, 2L, None)))
  }

  test("keys never match across groups") {
    val out = run(
      left = Seq(("a", 100L, 1L), ("b", 100L, 2L)),
      right = Seq(("a", 10L, 100L), ("b", 20L, 200L), ("c", 5L, 300L)))
    assert(out == Set(("a", 100L, 1L, Some(100L)), ("b", 100L, 2L, Some(200L))))
  }

  test("NULL times never match (no silent coercion to 0)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("t", LongType),
      StructField("lv", LongType)))
    val rschema = StructType(Seq(
      StructField("rk", StringType), StructField("rt", LongType),
      StructField("rv", LongType)))
    val l = spark.createDataFrame(
      java.util.Arrays.asList(Row("a", null, 1L), Row("a", 10L, 2L)), schema)
    val r = spark.createDataFrame(
      java.util.Arrays.asList(Row("a", null, 100L), Row("a", 5L, 200L)), rschema)
    val out = GraftOps.asofJoin(l, r, Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .select("lv", "rv").collect()
      .map(row => (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)))).toSet
    // null-time left row matches nothing; the real row matches only
    // the non-null-time right row (NOT the null-time one coerced to 0)
    assert(out == Set((1L, None), (2L, Some(200L))))
  }

  test("matches the union-window formulation on the events table") {
    val d = TestSpark.sfDir
    val expected = SparkEntry.queries("q_asof_join")(spark, d)
      .collect().map(_.toSeq).toSet
    val actual = SparkEntry.queries("q_asof_join_custom")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(actual == expected)
    assert(actual.nonEmpty)
  }

  test("plans as co-partitioned merge, not a nested loop") {
    val d = TestSpark.sfDir
    val p = SparkEntry.queries("q_asof_join_custom")(spark, d)
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    assert(p.contains("AsofJoin"), s"expected the custom exec node:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of join must not fall back to a nested loop:\n$p")
  }
}

package graft

import graft.plans.GraftOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct tests of the custom broadcast interval-stab join
  * ([[graft.plans.RangeJoin]]); the oracle-checked q_range_join_custom
  * query is the cross-engine proof, these cover the edge semantics and
  * a randomized equivalence sweep against the declarative BETWEEN
  * join.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(points: Seq[(Long, Long)], intervals: Seq[(Long, Long, Long)]) = {
    val p = points.toDF("pt", "pv")
    val iv = intervals.toDF("iid", "s", "e")
    GraftOps.rangeJoin(p, iv, col("pt"), col("s"), col("e"))
      .select("pt", "pv", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  test("point matches every containing interval, bounds inclusive") {
    val out = run(
      points = Seq((5L, 1L), (10L, 2L), (20L, 3L)),
      intervals = Seq((100L, 5L, 10L), (200L, 10L, 20L), (300L, 21L, 30L)))
    assert(out == Set(
      (5L, 1L, 100L), // start-inclusive
      (10L, 2L, 100L), (10L, 2L, 200L), // end- and start-inclusive, two hits
      (20L, 3L, 200L))) // end-inclusive
  }

  test("overlapping, nested, and duplicate intervals all hit") {
    val out = run(
      points = Seq((15L, 1L)),
      intervals = Seq(
        (1L, 0L, 100L), (2L, 10L, 20L), (3L, 10L, 20L), // duplicate range
        (4L, 14L, 16L), (5L, 15L, 15L), // nested, degenerate single-point
        (6L, 16L, 30L))) // starts after the point
    assert(out.map(_._3) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("empty (start > end) and NULL-bounded intervals never match") {
    val p = Seq((5L, 1L)).toDF("pt", "pv")
    val iv = Seq(
      (1L, Some(10L), Some(0L)), // start > end
      (2L, None, Some(10L)), // NULL start
      (3L, Some(0L), None), // NULL end
      (4L, Some(0L), Some(10L))) // the only real interval
      .toDF("iid", "s", "e")
    val out = GraftOps.rangeJoin(p, iv, col("pt"), col("s"), col("e"))
      .select("iid").as[Long].collect().toSet
    assert(out == Set(4L))
  }

  test("NULL points match nothing (inner-join semantics)") {
    val p = Seq((Some(5L), 1L), (None, 2L)).toDF("pt", "pv")
    val iv = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val out = GraftOps.rangeJoin(p, iv, col("pt"), col("s"), col("e"))
      .select("pv").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("empty sides produce empty output") {
    assert(run(Seq.empty, Seq((1L, 0L, 10L))).isEmpty)
    assert(run(Seq((5L, 1L)), Seq.empty).isEmpty)
  }

  test("randomized equivalence with the declarative BETWEEN join") {
    val rnd = new scala.util.Random(42)
    val points = Seq.tabulate(500)(i => (rnd.nextLong(200L), i.toLong))
    val intervals = Seq.tabulate(60) { i =>
      val s = rnd.nextLong(200L)
      (i.toLong, s, s + rnd.nextLong(40L))
    }
    val got = run(points, intervals)
    val p = points.toDF("pt", "pv")
    val iv = intervals.toDF("iid", "s", "e")
    val want = p.join(iv, col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pt", "pv", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("plans as RangeJoinExec over a broadcast exchange, no nested loop") {
    val p = Seq((5L, 1L)).toDF("pt", "pv")
    val iv = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val plan = GraftOps.rangeJoin(p, iv, col("pt"), col("s"), col("e"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"))
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}

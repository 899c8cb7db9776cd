package graft

import graft.plans.GraftOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("matches the window-function formulation exactly") {
    val viaWindow = SparkEntry.queries("q_top_customers")(spark, d)
      .drop("rank_in_segment").collect().map(_.toSeq).toSet
    val viaCustom = SparkEntry.queries("q_topk_per_key")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(viaCustom == viaWindow)
  }

  test("plans as partial + final heap passes around one exchange") {
    val df = SparkEntry.queries("q_topk_per_key")(spark, d)
    df.collect()
    // SparkPlan.nodeName strips the Exec suffix -> "TopKPerKey";
    // AQE's toString repeats the tree under "== Initial Plan ==",
    // so only inspect the final section.
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("TopKPerKey \\[".r.findAllIn(p).length == 2,
      s"expected a partial and a final TopKPerKeyExec in:\n$p")
    assert(p.contains("Exchange hashpartitioning(c_mktsegment"),
      "expected the key exchange between the heap passes")
  }

  test("bounded heap semantics: ties break by lowest tie column") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 5.0),
      ("b", 7L, 1.0), ("b", 6L, 2.0))
      .toDF("key", "id", "score")
    val out = GraftOps.topKPerKey(df, Seq(col("key")), col("score"), col("id"), 2)
      .select("key", "id").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 6L), ("b", 7L)))
  }

  test("k larger than group size returns whole groups") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("key", "id", "score")
    val out = GraftOps.topKPerKey(df, Seq(col("key")), col("score"), col("id"), 100)
    assert(out.count() == 2)
  }

  test("null order values are dropped, null keys form their own group") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 1L, Some(3.0)), (Some("a"), 2L, None),
      (None: Option[String], 3L, Some(1.0)))
      .toDF("key", "id", "score")
    val out = GraftOps.topKPerKey(df, Seq(col("key")), col("score"), col("id"), 5)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }
}

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

  test("distinctOrd: duplicates collapse to one heap slot, within and across partitions") {
    import spark.implicits._
    // key "a": values 10,10,10,5,5,3 (dups of the best values would
    // fill a k=3 plain heap; distinct must surface 10,5,3) spread over
    // 4 partitions so the partial->final merge dedups too.
    val df = Seq(
      ("a", 10L), ("a", 10L), ("a", 10L), ("a", 5L), ("a", 5L), ("a", 3L),
      ("a", 1L),
      ("b", 7L), ("b", 7L))
      .toDF("key", "v").repartition(4)
    val out = GraftOps.topKPerKeyDistinct(
      df, Seq(col("key")), col("v"), col("v"), 3)
      .select("key", "v").as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq.sorted }
    assert(out("a") == Seq(3L, 5L, 10L), s"got $out")
    assert(out("b") == Seq(7L), s"got $out")
    // plain topKPerKey on the same input keeps duplicate ranks
    val plain = GraftOps.topKPerKey(
      df, Seq(col("key")), col("v"), col("v"), 3)
      .filter(col("key") === "a").select("v").as[Long].collect().toSeq.sorted
    assert(plain == Seq(10L, 10L, 10L))
  }

  test("distinctOrd: a duplicate of an evicted value cannot re-enter past better ranks") {
    import spark.implicits._
    // single partition: arrival order matters for the heap internals
    val df = Seq(1L, 2L, 3L, 4L, 1L).toDF("v")
      .withColumn("key", lit("k")).coalesce(1)
    // k=2 largest distinct: 3,4. The late duplicate of the evicted 1
    // must not displace anything.
    val out = GraftOps.topKPerKeyDistinct(
      df, Seq(col("key")), col("v"), col("v"), 2)
      .select("v").as[Long].collect().toSeq.sorted
    assert(out == Seq(3L, 4L))
  }

  test("distinctOrd KMV equivalence: distinct heap == dropDuplicates + plain heap") {
    import spark.implicits._
    // pseudo-random multiset with many duplicates, two sides
    val rows = (0 until 5000).map { i =>
      val h = ((i * 2654435761L) % 97) + 1 // 97 distinct values, heavy dups
      (i % 2, h)
    }
    val df = rows.toDF("side", "h").repartition(8)
    val viaDistinctHeap = GraftOps.topKPerKeyDistinct(
      df.withColumn("neg", -col("h")), Seq(col("side")), col("neg"), col("h"), 16)
      .select("side", "h").as[(Int, Long)].collect().toSet
    val viaDropDup = GraftOps.topKPerKey(
      df.dropDuplicates("side", "h").withColumn("neg", -col("h")),
      Seq(col("side")), col("neg"), col("h"), 16)
      .select("side", "h").as[(Int, Long)].collect().toSet
    assert(viaDistinctHeap == viaDropDup)
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

package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks on constructed inputs for the round-4 operators
  * (the sf0.01 DuckDB hash compare is the cross-engine gate; these pin
  * the intended BEHAVIOR on shapes the synthetic corpus may not hit).
  */
class NewOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("label propagation splits two cliques joined by one bridge edge") {
    import spark.implicits._
    // Two K4 cliques {0..3} and {10..13} plus a single bridge 3-10.
    // CC would merge everything; LPA must keep two communities (each
    // node's neighborhood majority stays inside its clique).
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val pairs = (clique(0L to 3L) ++ clique(10L to 13L) :+ (3L, 10L)).toDF("i", "j")
    val out = Graph.labelPropFrom(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = (0L to 3L).map(out)
    val right = (10L to 13L).map(out)
    assert(left.toSet.size == 1, s"left clique not uniform: $left")
    assert(right.toSet.size == 1, s"right clique not uniform: $right")
    assert(left.head != right.head, "bridge edge must not merge the cliques")
  }

  test("label propagation is deterministic across runs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L)).toDF("i", "j")
    val a = Graph.labelPropFrom(pairs).collect().map(_.toSeq).toSet
    val b = Graph.labelPropFrom(pairs).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("knn graph: every anchor gets at most 5 ranked same-label neighbors") {
    val out = SparkEntry.queries("emb_knn_graph")(spark, d).cache()
    try {
      val perAnchor = out.groupBy("vec_id").agg(
        count(lit(1)).as("n"), max(col("rk")).as("maxrk"), min(col("rk")).as("minrk"))
      assert(perAnchor.filter(col("n") > 5).count() == 0)
      // ranks are 1..n dense per anchor
      assert(perAnchor.filter(col("maxrk") =!= col("n") || col("minrk") =!= 1).count() == 0)
      // no self loops
      assert(out.filter(col("vec_id") === col("nbr_id")).count() == 0)
      // cosine non-increasing with rank per anchor
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("vec_id").orderBy("rk")
      val bad = out.withColumn("prev", lag(col("cosine"), 1).over(w))
        .filter(col("prev").isNotNull && col("prev") < col("cosine"))
      assert(bad.count() == 0, "cosine must be non-increasing in rank")
    } finally out.unpersist()
  }

  test("time decay: an old-only user scores below an equal-volume recent user") {
    val out = SparkEntry.queries("q_time_decay")(spark, d)
    // invariant: decayed_score <= sum(value) per user (weights <= 1),
    // with equality only when every event sits in the newest half-life
    val raw = Tables.events(spark, d)
      .groupBy("user_id").agg(sum(col("value")).as("raw_sum"))
    val joined = out.join(raw, "user_id")
      .filter(col("decayed_score") > col("raw_sum") + lit(1e-6))
    assert(joined.count() == 0, "decay must never amplify")
  }

  test("anomaly: constant hourly counts are never anomalous; one spike is") {
    // The integer z-test on a constructed frame mirrors the operator's
    // algebra: flat counts give lhs = 0; one large spike among flat
    // counts must trip.
    def flags(counts: Seq[Long]): Seq[Boolean] = {
      val n = counts.size.toLong
      val s1 = counts.sum
      val s2 = counts.map(c => c * c).sum
      counts.map { c =>
        val dev = n * c - s1
        dev * dev > 9L * (n * s2 - s1 * s1)
      }
    }
    assert(flags(Seq.fill(48)(7L)).forall(!_))
    val spiked = flags(Seq.fill(47)(7L) :+ 700L)
    assert(spiked.last, "the spike hour must flag")
    assert(spiked.init.forall(!_), "flat hours must not flag")
  }

  test("kmeans: every vector assigned to a live cell with non-negative distance") {
    val out = SparkEntry.queries("emb_kmeans")(spark, d).cache()
    try {
      val n = Tables.embeddings(spark, d).count()
      assert(out.count() == n, "every vector must be assigned")
      assert(out.filter(col("cell") < 0 || col("cell") > 7).count() == 0)
      assert(out.filter(col("dist") < 0).count() == 0,
        "integer squared L2 cannot be negative")
      // the seeds' cells survive round 1 (each seed is distance 0 to
      // its own centroid), so round 2 has at least one live cell
      assert(out.select("cell").distinct().count() >= 1)
      // determinism across runs
      val again = SparkEntry.queries("emb_kmeans")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(again == out.collect().map(_.toSeq).toSet)
    } finally out.unpersist()
  }

  test("knn graph plans through the bounded-heap top-k rewrite") {
    val plan = SparkEntry.queries("emb_knn_graph")(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"the row_number filter must rewrite to the bounded-heap operator:\n$plan")
  }

  test("kmeans broadcasts the centroid frame into the corpus scan") {
    val plan = SparkEntry.queries("emb_kmeans")(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the K-row centroid side must broadcast, never shuffle the corpus:\n$plan")
  }

  test("time decay and watermark audit broadcast their tiny build sides") {
    for (q <- Seq("q_time_decay", "q_watermark_audit")) {
      val plan = SparkEntry.queries(q)(spark, d)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
        s"$q: the one-row/3-row side must broadcast:\n$plan")
    }
  }

  test("score diffusion: scores stay within the seed score range") {
    val out = SparkEntry.queries("knn_score_diffusion")(spark, d).cache()
    try {
      // diffused is a convex combination of own + neighbor seed scores,
      // so it cannot escape the global [min, max] of the seeds
      val row = out.agg(
        min(col("quality_score")), max(col("quality_score")),
        min(col("diffused_score")), max(col("diffused_score"))).head
      val (qLo, qHi, dLo, dHi) =
        (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
      assert(dLo >= qLo - 1e-6 && dHi <= qHi + 1e-6,
        s"diffused [$dLo,$dHi] escaped seed range [$qLo,$qHi]")
      // and every doc is emitted exactly once
      assert(out.count() == out.select("doc_id").distinct().count())
    } finally out.unpersist()
  }
}

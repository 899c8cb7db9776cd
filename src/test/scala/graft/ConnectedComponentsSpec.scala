package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct tests of the pointer-jumping connected-components loop
  * (graft.operators.Dedup.connectedComponents) on synthetic graphs —
  * in particular a long path, which the round-1 diameter-bounded
  * propagation could not finish inside its round cap.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ccOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val p = pairs.toDF("i", "j")
    val edges = p.unionByName(p.select(col("j").as("i"), col("i").as("j")))
      .toDF("src", "dst")
    graft.operators.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("long path (diameter 199) converges in log rounds to the min label") {
    // Path 0-1-2-...-199: min-label must travel 199 hops; pointer
    // jumping gets there in ~log2(199)+slack rounds (cap is 64 —
    // plain per-hop propagation would need 199 rounds and throw).
    val chain = (0L until 199L).map(k => (k, k + 1))
    val labels = ccOf(chain)
    assert(labels.size == 200)
    assert(labels.values.forall(_ == 0L), "every path node must label to 0")
  }

  test("disjoint components keep separate min labels") {
    // two triangles + an isolated edge, ids deliberately interleaved
    val labels = ccOf(Seq((10L, 2L), (2L, 30L), (30L, 10L),
      (5L, 40L), (40L, 7L), (7L, 5L),
      (100L, 50L)))
    assert(labels(10L) == 2L && labels(2L) == 2L && labels(30L) == 2L)
    assert(labels(5L) == 5L && labels(40L) == 5L && labels(7L) == 5L)
    assert(labels(100L) == 50L && labels(50L) == 50L)
  }

  test("star graph (hot hub) converges with the hub labeled by its min leaf") {
    val labels = ccOf((1L to 50L).map(k => (0L, k)) :+ (60L, 0L))
    assert(labels.values.forall(_ == 0L))
    assert(labels.size == 52)
  }
}

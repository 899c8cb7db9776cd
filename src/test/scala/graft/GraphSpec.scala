package graft

import graft.operators.Graph
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Degree-oriented triangle counting (graft.operators.Graph) on
  * synthetic graphs — in particular the hub/star shape whose
  * un-oriented wedge join fans out quadratically in hub degree.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("i", "j")
  }

  private def trianglesOf(pairs: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Graph.trianglesFrom(pairsDf(pairs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("hub/star graph: orientation bounds the wedge join to ZERO rows") {
    // One hub (id 2000) with 1000 leaves. Un-oriented, the hub is the
    // middle of C(1000, 2) = 499500 wedges — the skew bomb. Oriented
    // low->high by (degree, id), every edge points leaf -> hub, the
    // hub has out-degree 0, and the wedge join emits nothing.
    val star = (1L to 1000L).map(k => (k, 2000L))
    val directed = Graph.orientEdges(pairsDf(star))
    assert(Graph.orientedWedges(directed).count() == 0L,
      "a pure star must produce zero oriented wedges")
    assert(trianglesOf(star).isEmpty)
  }

  test("hub with one cross edge: wedge count is per-leaf, not per-hub") {
    // Star plus a single leaf-leaf edge: exactly one triangle, and the
    // wedge join stays bounded by leaf out-degrees (each leaf has
    // out-degree <= 2), never the hub's.
    val g = (1L to 1000L).map(k => (k, 2000L)) :+ (1L, 2L)
    val directed = Graph.orientEdges(pairsDf(g))
    val wedges = Graph.orientedWedges(directed).count()
    assert(wedges <= 2000L, s"oriented wedges must stay O(|E|), got $wedges")
    assert(trianglesOf(g) == Set((1L, 2L, 2000L)))
  }

  test("K5 clique yields C(5,3) = 10 id-sorted triangles") {
    val nodes = Seq(3L, 7L, 11L, 20L, 42L)
    val clique = for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)
    val expected = (for {
      a <- nodes; b <- nodes; c <- nodes if a < b && b < c
    } yield (a, b, c)).toSet
    assert(trianglesOf(clique) == expected)
    assert(expected.size == 10)
  }

  test("two triangles sharing an edge enumerate exactly twice") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L))
    assert(trianglesOf(g) == Set((1L, 2L, 3L), (2L, 3L, 4L)))
  }

  test("pagerank matches a sequential fixed-point reference and respects symmetry") {
    // path graph 1-2-3: ends are symmetric, center accumulates more
    val g = Seq((1L, 2L), (2L, 3L))
    val got = Graph.pageRankFrom(pairsDf(g))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent sequential reference of the same fixed-point recurrence
    val edges = g.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000000L).toMap
    for (_ <- 0 until 10) {
      rank = edges.groupBy(_._2).map { case (v, es) =>
        v -> (150000000L + es.map { case (u, _) =>
          (85L * rank(u) / 100) / deg(u)
        }.sum)
      }
    }
    assert(got == rank, s"engine $got != reference $rank")
    assert(got(1L) == got(3L), "symmetric path ends must rank equally")
    assert(got(2L) > got(1L), "path center must outrank the ends")
    // damped mass stays under the initial total (floor-divisions leak)
    assert(got.values.sum <= 3L * 1000000000L)
  }

  test("keep_rank keeps exactly one rank-max doc per cluster") {
    // two clusters: a 3-path (center 2 must win) and a pair (4,5)
    val g = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    val rows = Graph.keepRankFrom(pairsDf(g))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 5)
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.size == 2)
    byCluster.foreach { case (c, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cluster $c kept ${kept.length} docs")
      assert(kept.head._3 == members.map(_._3).max,
        s"cluster $c: kept doc is not rank-max")
    }
    // the path's center outranks its ends and survives
    assert(rows.find(_._1 == 2L).get._4, "path center must be the canonical")
  }
}

package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph-motif operators over the near-dup pair graph (the edge set
  * [[Dedup.ngramJaccard]] emits, also consumed by the
  * connected-components keep decision).
  *
  * Triangle counting is the standard cluster-quality diagnostic for a
  * dedup graph: near-dup clusters should be near-cliques, so a low
  * triangle count relative to wedge count (low clustering coefficient)
  * flags chains of borderline pairs that CC would over-merge.
  */
object Graph {

  /** Triangle enumeration via the two-equi-join wedge formulation:
    * edges kept as (i < j), wedges built by joining edges sharing the
    * middle vertex, closed by a third equi-join on the outer pair.
    * Every join is an equi-join on vertex ids — no cross product; at
    * corpus scale the standard refinement is degree orientation
    * (direct each edge low-degree -> high-degree before the wedge
    * join, bounding per-vertex fan-out by max out-degree ~ sqrt(|E|))
    * — same plan shape, different join keys, noted here because the
    * dedup pair graph's components are tiny cliques where id order
    * already bounds the fan-out.
    */
  val triangles = QueryDef(
    "graph_triangles",
    (s, d) => {
      val e = Dedup.ngramJaccard.fn(s, d).select("i", "j")
      val ab = e.select(col("i").as("a"), col("j").as("b"))
      val bc = e.select(col("i").as("b"), col("j").as("c"))
      val ac = e.select(col("i").as("a"), col("j").as("c"))
      ab.join(bc, "b")
        .join(ac, Seq("a", "c"), "left_semi")
        .select("a", "b", "c")
    },
    Some(Dedup.ngramJaccard.oracle.map { jaccardSql =>
      val inner = jaccardSql.replace("ORDER BY i, j", "")
      s"""WITH pairs AS ($inner)
    SELECT w.a, w.b, w.c FROM (
      SELECT ab.i AS a, ab.j AS b, bc.j AS c
      FROM pairs ab JOIN pairs bc ON ab.j = bc.i) w
    WHERE EXISTS (SELECT 1 FROM pairs ac WHERE ac.i = w.a AND ac.j = w.c)
    ORDER BY a, b, c"""
    }.get))

  val defs: Seq[QueryDef] = Seq(triangles)
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, IndexLookup, NearestCodes, SubCodewords}

/** Evidence for the r10 plan-hygiene change: cell-id tables ride as
  * codegen reference objects ([[graft.functions.IndexLookup]] composed
  * under `pqCells`), never as k-long `typedlit` plan literals, and the
  * PQ expression family compares by CONTENT (Array fields otherwise
  * fall back to reference identity, silently defeating Catalyst
  * common-subexpression elimination / plan-cache hits).
  */
class PqCellsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // a 3-centroid single-subspace coarse quantizer over width-4 vectors
  private val books: Array[Array[Array[Long]]] =
    Array(Array(
      Array(0L, 0L, 0L, 0L),
      Array(10L, 10L, 10L, 10L),
      Array(100L, 100L, 100L, 100L)))
  private val ids = Array(7L, 42L, 99L)

  test("pqCells maps dense centroid indices to cell ids, best first") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 1L, 1L, 1L)),     // nearest 0 (id 7), then 1 (42)
      (2L, Seq(9L, 9L, 9L, 9L)),     // nearest 1 (42), then 0 (7)
      (3L, Seq(80L, 80L, 80L, 80L))  // nearest 2 (99), then 1 (42)
    ).toDF("vec_id", "qa")
    val got = df.select(col("vec_id"),
      GraftFunctions.pqCells(col("qa"), books, ids, 2).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(got == Map(1L -> List(7L, 42L), 2L -> List(42L, 7L),
      3L -> List(99L, 42L)))
  }

  test("IndexLookup is NULL-safe on malformed input, never throws") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(0, 2)), Tuple1(Seq(0, 5))).toDF("codes")
    val out = df.select(
      Bridge.column(IndexLookup(Bridge.expression(col("codes")), ids)).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0).toList)
    assert(out(0) == List(7L, 99L))
    assert(out(1) == null, "out-of-range index must yield NULL, not throw")
  }

  test("plan text carries no per-cell literals (reference objects only)") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 1L, 1L, 1L))).toDF("vec_id", "qa")
    // analyzed (pre-folding) plan: over a literal LocalRelation the
    // optimizer constant-folds the whole projection away — itself
    // evidence the expressions are foldable — so the literal-leak
    // assertion must look at the plan as built
    // strip Catalyst expression ids (#123) AND the reference objects'
    // identity-hash print form ([J@5e4299b1) first — both are
    // arbitrary and can spuriously contain the digits asserted below
    val plan = df.select(
      GraftFunctions.pqCells(col("qa"), books, ids, 2).as("cells"))
      .queryExecution.analyzed.toString
      .replaceAll("#\\d+", "#").replaceAll("@[0-9a-f]+", "@")
    // the id values must NOT appear in the plan text; the expressions
    // print as names over a JVM reference
    assert(!plan.contains("42") && !plan.contains("99"),
      s"cell ids leaked into the plan text:\n$plan")
    assert(plan.contains("graft_idx_lookup") && plan.contains("graft_pq_codes"))
  }

  test("PQ expressions compare by codebook CONTENT, not array identity") {
    val mk = () => Array(Array(Array(1L, 2L), Array(3L, 4L)))
    val child = Bridge.expression(col("qa"))
    val a = NearestCodes(child, mk(), 1)
    val b = NearestCodes(child, mk(), 1)
    assert(a == b && a.hashCode == b.hashCode,
      "structurally identical NearestCodes from distinct array instances " +
        "must be equal (CSE/plan-cache correctness)")
    assert(a != NearestCodes(child, Array(Array(Array(1L, 2L), Array(3L, 9L))), 1))
    val ia = IndexLookup(child, Array(5L, 6L))
    val ib = IndexLookup(child, Array(5L, 6L))
    assert(ia == ib && ia.hashCode == ib.hashCode)
    assert(ia != IndexLookup(child, Array(5L, 7L)))
    val codes = Bridge.expression(col("codes"))
    val sa = SubCodewords(child, codes, mk())
    val sb = SubCodewords(child, codes, mk())
    assert(sa == sb && sa.hashCode == sb.hashCode)
  }

  test("blocked dedup's k guard fails loudly past the flat-assignment bound") {
    import graft.operators.Similarity
    assert(Similarity.requireBlockCells(65536L) == 65536)
    val e = intercept[IllegalArgumentException] {
      Similarity.requireBlockCells(7812500L) // the 1e9-vector tier
    }
    assert(e.getMessage.contains("dedup_embedding_hier"),
      "the guard must name the registered escape path, not just refuse")
  }
}

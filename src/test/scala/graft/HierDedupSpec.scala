package graft

import org.scalatest.funsuite.AnyFunSuite

/** Evidence for `dedup_embedding_hier` — the two-level (hierarchical)
  * assignment variant of the blocked composition, i.e. the 1e9-tier
  * rework the flat operator's guard names, registered and
  * oracle-checked — beyond what the 3-SF oracle hash already proves:
  * the totality the probe-supers-with-children rule guarantees, the
  * structural claim that distinguishes it from the flat path (child
  * state joined, never expression-shipped), and the MEASURED
  * approximation cost of assigning through two levels instead of
  * scanning all k cells.
  */
class HierDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private lazy val (resultDf, pairsDf) =
    graft.operators.Similarity.hierStages(spark, d)
  private lazy val result = resultDf.collect()
  private lazy val pairs = pairsDf.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("total: one audit row per augmented vector even with childless supers") {
    val n = Tables.embeddings(spark, d).count()
    assert(result.length == 2 * n,
      "probing supers-with-children must leave no vector cell-less")
    assert(result.map(_.getLong(0)).distinct.length == result.length)
    result.foreach { r =>
      val keepDup = r.getBoolean(4)
      val keep = r.getBoolean(5)
      assert(!keep || keepDup, "keep implies surviving the near-dup stage")
      assert(r.isNullAt(3) == keepDup, "dup_of is set exactly for pruned dups")
      if (!r.isNullAt(3))
        assert(r.getLong(3) < r.getLong(0), "first copy wins: dup_of < vec_id")
    }
  }

  test("state placement: child centroids are JOINED, never expression-shipped") {
    // the flat operator's assignment rides pqCells (reference-object
    // expressions, k-scaled payload in the task binary); hier's whole
    // point is that NO k-scaled state leaves the executors. The
    // registered query checkpoints the assignment table (hiding its
    // plan), so assert on the UNcheckpointed seam — the assignment
    // stages themselves, where a pqCells regression would live
    val p = graft.operators.Similarity.hierAssign(spark, d)
      .queryExecution.executedPlan.toString
    assert(!p.contains("graft_pq_codes") && !p.contains("graft_idx_lookup"),
      "hier assignment must not ship centroid state in expressions")
    assert(!p.contains("CartesianProduct"),
      s"super probes must broadcast (BNL over k1 rows), never cartesian:\n" +
        p.linesIterator.take(30).mkString("\n"))
  }

  test("pair contract: ordered, exact-verified at tau") {
    assert(pairs.nonEmpty, "augmented corpus must contain near-dups")
    pairs.foreach { case (i, j, cos) =>
      assert(i < j)
      assert(cos >= graft.operators.Similarity.hiTau)
    }
  }

  test("recall vs the flat blocked contract — the price of two-level assignment") {
    val flat = graft.operators.Similarity.blockedStages(spark, d)._2
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    val recall = (got & flat).size.toDouble / flat.size
    info(f"hier pair recall vs flat blocked: $recall%.3f " +
      f"(${got.size} hier vs ${flat.size} flat)")
    // two-level assignment can only lose a pair when the probed
    // supers hide the pair's shared cell; the floor pins that the
    // approximation stays a refinement, not a different operator
    assert(recall >= 0.85, s"two-level assignment lost too many pairs: $recall")

    val wide = SparkEntry.queries("dedup_embedding_wide")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wRecall = (got & wide).size.toDouble / wide.size
    info(f"hier pair recall vs unblocked wide contract: $wRecall%.3f")
    assert(wRecall >= 0.85, s"recall vs ground-truth-ish contract: $wRecall")
  }

  test("probe-generic: probe=3 runs the same dataflow end-to-end (r12)") {
    // The r10 build hardcoded 2 probes (min/max-struct cell/cell2 and
    // literal rk<=2 oracle windows) behind a loud require; the r12
    // rewrite derives every probe step from one constant. This test
    // PROVES the generality by running probe=3 through the identical
    // dataflow: totality must hold, cells must be bounded/ordered/
    // distinct, and wider probing must not lose recall beyond the
    // noise of primary-cell shifts (a vector's best child can change
    // when a third super is probed, so exact set-monotonicity of the
    // final cells is NOT the contract — recall is).
    val Sim = graft.operators.Similarity
    val aug = Sim.augmentedHi(spark, d).localCheckpoint(true)
    val augN = aug.count()
    val a3 = Sim.hierAssignFrom(spark, aug, augN, probe = 3)
      .localCheckpoint(true)
    val rows = a3.collect()
    assert(rows.length == augN, "totality must hold at any probe breadth")
    rows.foreach { r =>
      val cells = r.getSeq[Long](2)
      assert(cells.nonEmpty && cells.size <= 3, s"cells bounded by probe: $cells")
      assert(cells.distinct.size == cells.size, s"cells distinct: $cells")
      assert(cells.head == r.getLong(1), "cells must lead with the primary cell")
    }
    val p3 = Sim.bandedPruneFrom(a3)._2.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = SparkEntry.queries("dedup_embedding_wide")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r3 = (p3 & wide).size.toDouble / wide.size
    val r2 = (pairs.map(p => (p._1, p._2)).toSet & wide).size.toDouble / wide.size
    info(f"recall vs wide contract: probe=3 $r3%.3f vs probe=2 $r2%.3f")
    assert(r3 >= r2 - 0.02,
      s"wider probing lost recall beyond cell-shift noise: $r3 vs $r2")
  }

  test("cell occupancy stays near the cap (the linear-cost precondition)") {
    val sizes = result.groupBy(_.getLong(1)).map(_._2.length)
    val cap = graft.operators.Similarity.cellCap
    info(s"cells=${sizes.size} max=${sizes.max} mean=${sizes.sum / sizes.size} cap=$cap")
    assert(sizes.max <= 8 * cap,
      s"a cell holds ${sizes.max} vectors — the O(cap) per-cell bound has degraded")
  }
}

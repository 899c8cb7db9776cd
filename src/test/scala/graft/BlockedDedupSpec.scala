package graft

import org.scalatest.funsuite.AnyFunSuite

/** Evidence for `dedup_embedding_blocked` — the registered 100-TB
  * composition (Lloyd cells → in-cell banded near-dup → SemDeDup
  * prune) — beyond what the 3-SF oracle hash already proves:
  * structural invariants, an independent in-memory re-derivation of
  * the first-copy-wins + dominance keep logic from the actual pair
  * contract, the measured recall cost of semantic blocking against
  * `dedup_embedding_wide`'s full (cross-cell-capable) pair contract,
  * and the cell-occupancy shape the linear-cost argument rests on.
  */
class BlockedDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private lazy val (resultDf, pairsDf) =
    graft.operators.Similarity.blockedStages(spark, d)
  private lazy val result = resultDf.collect()
  private lazy val pairs = pairsDf.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("one audit row per augmented vector; keep/dup_of invariants hold") {
    val n = Tables.embeddings(spark, d).count()
    assert(result.length == 2 * n, "every original + its jittered copy")
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

  test("pair contract: ordered, exact-verified at tau (cell sharing is oracle-proven)") {
    // pairs meet in a SHARED PROBED cell (primary or runner-up —
    // multi-probe); that join key is re-derived independently by the
    // DuckDB oracle, so here we pin the exactness contract only.
    assert(pairs.nonEmpty, "augmented corpus must contain near-dups")
    pairs.foreach { case (i, j, cos) =>
      assert(i < j)
      assert(cos >= graft.operators.Similarity.hiTau)
    }
  }

  test("keep logic re-derived in memory from the pair contract matches exactly") {
    // first-copy-wins from the pairs, then the SemDeDup dominance rule
    // over survivors using exact cosines — a from-scratch re-derivation
    // of stages 2b+3 (independent of the DataFrame join pipeline).
    val emb = graft.operators.Similarity.augmentedHi(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toArray, r.getLong(2))).toMap
    val dupOf = pairs.groupBy(_._2).map { case (j, ps) => j -> ps.map(_._1).min }
    val byCell = result.groupBy(_.getLong(1))
    def cosine(a: Long, b: Long): Double = {
      val (qa, na) = emb(a); val (qb, nb) = emb(b)
      var s = 0L; var i = 0
      while (i < qa.length) { s += qa(i) * qb(i); i += 1 }
      s.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    result.foreach { r =>
      val (v, cc) = (r.getLong(0), r.getDouble(2))
      val expectKeepDup = !dupOf.contains(v)
      assert(r.getBoolean(4) == expectKeepDup, s"keep_dup($v)")
      if (!expectKeepDup) assert(r.getLong(3) == dupOf(v), s"dup_of($v)")
      val expectKeep = expectKeepDup && !byCell(r.getLong(1)).exists { o =>
        val (ov, occ) = (o.getLong(0), o.getDouble(2))
        ov != v && o.getBoolean(4) &&
          cosine(v, ov) >= graft.operators.Similarity.semTau &&
          (occ < cc || (occ == cc && ov < v))
      }
      assert(r.getBoolean(5) == expectKeep, s"keep($v)")
    }
  }

  test("recall vs the unblocked wide pair contract — semantic blocking's measured cost") {
    val wide = SparkEntry.queries("dedup_embedding_wide")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    // NOT a subset relation in either direction: both contracts are
    // exact-verified at the same tau but band-sample the truth set
    // independently (wide: corpus-sized log bands, ~2% design miss;
    // blocked: cap-sized in-cell bands) — each catches true pairs the
    // other's banding happens to miss.
    val recall = (got & wide).size.toDouble / wide.size
    info(f"in-cell pair recall vs dedup_embedding_wide: $recall%.3f " +
      f"(${got.size} blocked vs ${wide.size} wide; " +
      f"${(got -- wide).size} true pairs wide's banding missed; " +
      "loss = pairs split across cells)")
    // the SemDeDup trade, repaired by multi-probe: single-cell
    // blocking measured 0.632 here (cell boundaries split 37% of true
    // pairs on this near-orthogonal corpus); probing the top-2 cells
    // recovers it to 0.984. The floor pins the multi-probe benefit.
    assert(recall >= 0.9, s"semantic blocking lost too many pairs: $recall")
  }

  test("cell occupancy stays near the cap (the linear-cost precondition)") {
    val sizes = result.groupBy(_.getLong(1)).map(_._2.length)
    val cap = graft.operators.Similarity.cellCap
    info(s"cells=${sizes.size} max=${sizes.max} mean=${sizes.sum / sizes.size} cap=$cap")
    assert(sizes.max <= 6 * cap,
      s"a cell holds ${sizes.max} vectors — the O(cap) per-cell bound has degraded")
  }
}

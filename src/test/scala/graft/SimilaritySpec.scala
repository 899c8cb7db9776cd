package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("ann_lsh results are a subset of brute-force rankings' vectors") {
    val exact = SparkEntry.queries("ann_bruteforce")(spark, d)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCos = SparkEntry.queries("ann_bruteforce")(spark, d)
      .select("qid", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("ann_lsh")(spark, d)
      .select("qid", "vec_id", "cosine").collect()
    assert(lsh.nonEmpty, "LSH produced no candidates at all")
    // any LSH hit that is also an exact top-5 pair must carry the
    // identical cosine (same quantized arithmetic)
    lsh.foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(c == r.getDouble(2), s"cosine mismatch for $r")
      }
    }
    // the top-ranked LSH hit per query must appear in the exact top-5
    val byQ = lsh.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      val best = rows.minBy(r => (-r.getDouble(2), r.getLong(1)))
      assert(exact.contains((qid, best.getLong(1))),
        s"best LSH hit for $qid not in exact top-5")
    }
  }

  test("dedup_embedding pairs are symmetric-free and above threshold") {
    val rows = SparkEntry.queries("dedup_embedding")(spark, d).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.45))
  }

  test("dedup_embedding banded candidates have recall 1.0 vs all-pairs at sf0.001") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairSet(graft.operators.Similarity.dedupEmbeddingAllPairs(spark, d))
    val banded = pairSet(SparkEntry.queries("dedup_embedding")(spark, d))
    assert(exact.nonEmpty, "all-pairs baseline found no near-dup pairs")
    // recall: every true pair survives the band blocking (measured
    // property of the fixed plane constants on this corpus)
    val missed = exact.keySet -- banded.keySet
    assert(missed.isEmpty, s"banded LSH missed true pairs: $missed")
    // precision is structural: the verify step computes the exact
    // quantized cosine, so no false pair can appear
    assert(banded.keySet.subsetOf(exact.keySet),
      "banded result contains pairs the exact baseline rejects")
    // identical cosines on the shared pairs (same quantized arithmetic)
    banded.foreach { case (k, c) => assert(exact(k) == c, s"cosine mismatch for $k") }
  }

  test("dedup_embedding_hi: wider bands keep ~all true dups and prune most random pairs") {
    import graft.operators.Similarity
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairSet(Similarity.dedupEmbeddingHiAllPairs(spark, d))
    val banded = pairSet(SparkEntry.queries("dedup_embedding_hi")(spark, d))
    // the augmented corpus plants one ~0.85-0.9-cosine copy per vector,
    // so the high-tau truth set is substantial, not vacuous
    assert(exact.size >= 400,
      s"expected most of the 500 planted copies above tau, got ${exact.size}")
    // recall: measured, not assumed — the 8-bit band formula predicts
    // ~0.98 at the tau boundary and more above it
    val recall = (exact.keySet & banded.keySet).size.toDouble / exact.size
    assert(recall >= 0.95, s"hi-tau banding recall $recall < 0.95 " +
      s"(missed ${(exact.keySet -- banded.keySet).size} of ${exact.size})")
    // precision is structural (exact cosine verify)
    assert(banded.keySet.subsetOf(exact.keySet),
      "banded result contains pairs the exact baseline rejects")
    banded.foreach { case (k, c) => assert(exact(k) == c, s"cosine mismatch for $k") }
    // the cost knob itself: candidate volume AFTER banding vs all
    // pairs — the wider 8-bit bands must prune >=90% (measured ~6%
    // candidate rate; D5's 4-bit bands pass ~64% on this corpus)
    val n = 1000L // 500 vectors + 500 copies
    val allPairs = n * (n - 1) / 2
    val cands = Similarity.dedupEmbeddingHiCandidates(spark, d)
    assert(cands.toDouble / allPairs <= 0.10,
      s"hi-tau bands passed $cands of $allPairs pairs — the knob is not pruning")
  }

  test("dedup_semantic_prune matches a brute-force reference sweep exactly") {
    // independent Scala reimplementation of the SemDeDup rule: same
    // quantization, floor-mean centroids, IEEE cosine — the keep sets
    // must agree EXACTLY (identical double arithmetic, no tolerance)
    val raw = Tables.embeddings(spark, d)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6).toLong).toArray))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val byLabel = raw.groupBy(_._2)
    val centroid = byLabel.map { case (lab, vs) =>
      val dim = vs.head._3.length
      lab -> Array.tabulate(dim) { i =>
        Math.floorDiv(vs.map(_._3(i)).sum, vs.length.toLong)
      }
    }
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    val cc = raw.map { case (id, lab, qa) => id -> cos(qa, centroid(lab)) }.toMap
    val refKeep = raw.map { case (id, lab, qa) =>
      val prunedBy = byLabel(lab).exists { case (u, _, qu) =>
        u != id && cos(qa, qu) >= 0.30 &&
          (cc(u) < cc(id) || (cc(u) == cc(id) && u < id))
      }
      id -> !prunedBy
    }.toMap

    val got = SparkEntry.queries("dedup_semantic_prune")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(got.length == raw.length)
    got.foreach { case (id, c, keep) =>
      assert(c == cc(id), s"vec $id: centroid cosine $c != reference ${cc(id)}")
      assert(keep == refKeep(id), s"vec $id: keep=$keep, reference ${refKeep(id)}")
    }
    // the rule's structural floor: the centroid-farthest vector of
    // each cluster can never be pruned, so every cluster survives
    byLabel.keys.foreach { lab =>
      assert(byLabel(lab).exists(v => got.find(_._1 == v._1).get._3),
        s"cluster $lab lost every vector")
    }
    val pruned = got.count(!_._3)
    assert(pruned > 0, "prune set empty — SemTau no longer bites on this corpus")
  }

  test("dedup_embedding plans as equi-join candidates, not a nested-loop cross") {
    val p = SparkEntry.queries("dedup_embedding")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"dedup_embedding must not plan an all-pairs nested loop:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"dedup_embedding must not plan a cartesian product:\n$p")
  }
}

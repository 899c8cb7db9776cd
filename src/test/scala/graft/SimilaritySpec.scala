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
}

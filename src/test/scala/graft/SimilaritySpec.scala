package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("ann_lsh results are a subset of brute-force rankings' vectors") {
    val exact = SparkEntry.queries("ann_bruteforce")(spark, d)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("ann_lsh")(spark, d)
      .select("qid", "vec_id", "cosine").collect()
    // every LSH hit above the verify threshold must be a true
    // neighbor pair score (cosine recomputed exactly), and the
    // top-ranked LSH hit per query should appear in the exact top-5
    // whenever LSH returned anything for that query
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

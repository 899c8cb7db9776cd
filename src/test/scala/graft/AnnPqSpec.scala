package graft

import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ correctness evidence (rows-only query — MLlib k-means||
  * init is not SQL-reproducible, so the oracle cannot replicate it):
  * shape invariants, exact-cosine agreement with brute force on
  * returned pairs, and the measured recall cost of the 64x
  * compression against both brute force and uncompressed IVF-Flat.
  */
class AnnPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("IVF-PQ returns ranked exact-cosine top-k per query") {
    val pq = SparkEntry.queries("ann_ivf_pq")(spark, d).collect()
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rows) =>
      assert(rows.length <= 5, s"top-k bound violated: ${rows.length}")
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length))
      val cos = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // the reported cosine is EXACT (rerank uses the same quantized
    // arithmetic as brute force) — ADC only chose the shortlist
    val bf = SparkEntry.queries("ann_bruteforce")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pq.foreach { r =>
      bf.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(c == r.getDouble(3))
      }
    }
  }

  test("PQ codes are 4-bit per subspace and one row per vector (the 64x claim)") {
    import org.apache.spark.sql.functions._
    val (encoded, centroids, books) =
      graft.operators.Similarity.pqIndex(spark, d, nList = 16)
    assert(centroids.length == 16 && centroids.forall(_.length == 64))
    assert(books.length == 8 && books.forall(b =>
      b.length == 16 && b.forall(_.length == 8)))
    val n = Tables.embeddings(spark, d).count()
    assert(encoded.count() == n, "code table must cover every vector exactly once")
    // every code fits 4 bits and every subspace is present: the
    // per-vector scan state really is cell id + 8 nibbles
    val bad = encoded.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c > 15)).count()
    assert(bad == 0, s"$bad vectors with out-of-range PQ codes")
    // codes discriminate (not a degenerate single-codeword fit): each
    // subspace uses a healthy share of its 16 codewords
    val used = encoded.select(posexplode(col("codes")).as(Seq("m", "c")))
      .distinct().groupBy("m").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((0 until 8).forall(m => used(m) >= 8),
      s"degenerate codebook usage per subspace: $used")
  }

  test("recall@5 vs brute force at sf0.01 — compression's measured cost") {
    val d01 = "/root/testdata/sf0.01"
    val truth = SparkEntry.queries("ann_bruteforce")(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val flat = graft.operators.Similarity.ivfTopK(spark, d01, nList = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = graft.operators.Similarity.ivfPqTopK(spark, d01, nList = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rFlat = (flat & truth).size.toDouble / truth.size
    val rPq = (pq & truth).size.toDouble / truth.size
    info(f"IVF-Flat  nprobe=4/16  recall@5=$rFlat%.3f")
    info(f"IVF-PQ    nprobe=4/16  recall@5=$rPq%.3f  (64x smaller scan state)")
    // the shortlist (50 ADC candidates rerank to top-5) should absorb
    // most PQ ranking error: PQ may trail Flat only modestly
    assert(rPq >= 0.6, s"IVF-PQ recall collapsed: $rPq")
    assert(rPq >= rFlat - 0.25,
      s"PQ recall $rPq too far below IVF-Flat $rFlat — shortlist not absorbing ADC error")
  }
}

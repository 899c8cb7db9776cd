package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hyperplanes

/** The JVM-static hyperplane cache + HyperplaneBandVals expression
  * behind dedup_embedding_wide (and, after the r7 retrofit, every
  * banding query): bit-compatibility with the literal plane matrix,
  * band-packing equivalence, the log-scaled sizing rule, and the
  * wide operator's measured recall/candidate-volume properties.
  */
class HyperplanesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("planes() is bit-identical to Similarity's literal matrix") {
    val lit = graft.operators.Similarity.hyperplanes
    val cached = Hyperplanes.planes(lit.length)
    assert(cached.length == lit.length)
    (lit.indices).foreach { j =>
      assert(cached(j).sameElements(lit(j)), s"plane $j diverged")
    }
  }

  test("expression band values equal a direct Scala recomputation (16x8)") {
    val emb = Tables.embeddings(spark, d).select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1000000L).cast("long")).as("qa"))
    val viaExpr = emb.select(col("vec_id"),
      graft.functions.GraftFunctions.hyperplaneBands(col("qa"), 16, 8).as("bv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val planes = Hyperplanes.planes(128)
    val qas = emb.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    viaExpr.foreach { case (id, bv) =>
      val qa = qas(id)
      val expect = Vector.tabulate(16) { b =>
        (0 until 8).foldLeft(0L) { (acc, k) =>
          val dot = qa.zip(planes(b * 8 + k)).map { case (a, p) => a * p }.sum
          if (dot > 0) acc | (1L << k) else acc
        }
      }
      assert(bv == expect, s"band mismatch for vec $id")
    }
  }

  test("wrong-width vector bands to NULL, not plausible buckets") {
    import spark.implicits._
    val bad = Seq((1L, Seq.fill(63)(5L)), (2L, Seq.fill(64)(5L)))
      .toDF("vec_id", "qa")
    val out = bad.select(col("vec_id"),
      graft.functions.GraftFunctions.hyperplaneBands(col("qa"), 4, 4).as("bv"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L), "63-dim vector must band to NULL")
    assert(!out(2L), "64-dim vector must band")
  }

  test("log-scaled plan: bits tracks ceil(log2 n), bands the LSH rule") {
    assert(Hyperplanes.bitsFor(1000L) == 10)
    assert(Hyperplanes.bitsFor(1024L) == 10)
    assert(Hyperplanes.bitsFor(1025L) == 11)
    assert(Hyperplanes.bitsFor(4000L) == 12)
    // bands monotone in bits (OR-amplification must rise as per-band
    // hit rate falls) and the registered tiers' exact values, which
    // the oracle's inlined lookup table shares
    val bands = (8 to 20).map(Hyperplanes.bandsFor)
    assert(bands == bands.sorted)
    assert(Hyperplanes.bandsFor(10) == 26)
    assert(Hyperplanes.bandsFor(12) == 39)
    // design-point recall implied by the table: 1-(1-p1^bits)^bands
    // >= 0.98 at every width in range
    val p1 = 1.0 - math.acos(Hyperplanes.DesignCosine) / math.Pi
    (8 to 20).foreach { bits =>
      val r = 1.0 - math.pow(1.0 - math.pow(p1, bits), Hyperplanes.bandsFor(bits))
      assert(r >= 1.0 - Hyperplanes.DesignMiss - 1e-9, s"recall $r at $bits bits")
    }
  }

  test("dedup_embedding_wide recall >= 0.95 vs the all-pairs truth set") {
    val truth = graft.operators.Similarity.dedupEmbeddingHiAllPairs(spark, d)
      .select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = SparkEntry.queries("dedup_embedding_wide")(spark, d)
      .select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "truth set empty — augmentation broken")
    val recall = (truth & wide).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall below design floor")
    // no false positives: every emitted pair is exact-verified
    assert((wide -- truth).isEmpty, "wide emitted a below-threshold pair")
  }

  test("banding plans carry no plane literals: explain stays KB-sized") {
    // pre-r7, dedup_embedding_hi's formatted plan was ~1.6 MB of
    // inlined plane constants (r6 What's-wrong 5); with the JVM-cached
    // expression the whole explain must stay small at ANY plane count
    for (name <- Seq("dedup_embedding_hi", "dedup_embedding_wide", "ann_lsh")) {
      val plan = SparkEntry.queries(name)(spark, d)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.length < 100000,
        s"$name explain is ${plan.length} chars — plane literals are back?")
    }
  }

  test("wide candidate volume is corpus-linear, not quadratic") {
    val n = Tables.embeddings(spark, d).count() * 2
    val (bands, bits) = Hyperplanes.wideBandPlan(n)
    val cands = graft.operators.Similarity.wideCandidates(spark, d, bands, bits)
    // random-collision budget: bands * n^2/2 / 2^bits <= bands * n/2
    // (bits >= log2 n); true-dup collisions add <= bands * n/2. A
    // 40*n ceiling is ~8x headroom over the expected ~5*n here and
    // generous against n^2/2 ~ 250x n.
    assert(cands <= 40L * n, s"candidates $cands exceed linear budget at n=$n")
    assert(cands >= n / 2, s"suspiciously few candidates: $cands")
  }
}

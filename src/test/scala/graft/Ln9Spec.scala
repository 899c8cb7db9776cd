package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ln9

/** The JVM-static ln-table cache + Ln9Big/Ln9Sat/Ln9Bounded codegen
  * expressions behind the whole ln9 family (classify_nb, sample_dsir,
  * mix_kl, mix_dsir, text_pmi, text_lm3_heldout, text_entropy,
  * text_lm_score, text_ppl_bucket, knn_score_diffusion): bit-
  * compatibility with the former plan-literal formulations, so the r8
  * retrofit provably changes NO query result.
  */
class Ln9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The former Select.ln9big literal chain, verbatim. */
  private def literalLn9Big(n: Column): Column = {
    val lnTable: IndexedSeq[Long] = IndexedSeq.tabulate(4096)(i =>
      if (i < 1) 0L else math.floor(math.log(i.toDouble) * 1e9).toLong)
    val bits = length(bin(n.cast(LongType)))
    val shift = greatest(bits - lit(12), lit(0)).cast(IntegerType)
    val m = call_function("shiftright", n.cast(LongType), shift)
    element_at(typedlit(lnTable), (m + 1).cast(IntegerType)) +
      shift.cast(LongType) * Ln9.Ln2_9
  }

  /** Boundary lattice: every power of two +-1 up to 2^62, the mantissa
    * table edges, and a spread of odd values per octave.
    */
  private val lattice: Seq[Long] = {
    val pows = (0 to 62).map(1L << _)
    val edges = Seq(0L, 1L, 2L, 3L, 2047L, 2048L, 4095L, 4096L, 4097L)
    val spread = (12 to 62 by 5).flatMap(s =>
      Seq((1L << s) + (1L << (s - 3)) + 1L, (1L << s) | 0x5555L))
    (pows ++ pows.map(_ - 1) ++ pows.map(_ + 1) ++ edges ++ spread)
      .filter(n => n >= 0 && n < Long.MaxValue).distinct.sorted
  }

  test("Ln9Big equals the literal chain over the boundary lattice (codegen path)") {
    import spark.implicits._
    val df = lattice.toDF("n")
    val rows = df.select(col("n"), Ln9.big(col("n")).as("a"),
      literalLn9Big(col("n")).as("b")).collect()
    assert(rows.length == lattice.length)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"ln9big diverged at n=${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}")
    }
  }

  test("Ln9Big exact below 4096, mantissa truncation bounded above") {
    (1L until 4096L).foreach { n =>
      assert(Ln9.ln9big(n) == math.floor(math.log(n.toDouble) * 1e9).toLong,
        s"not exact at $n")
    }
    lattice.filter(_ >= 4096L).foreach { n =>
      val err = math.log(n.toDouble) - Ln9.ln9big(n) / 1e9
      assert(err >= 0 && err < 5.0e-4, s"truncation out of bound at $n: $err")
    }
  }

  test("Ln9Big rejects negative input with a clear error") {
    val e = intercept[Exception] {
      spark.range(1).select(Ln9.big(lit(-5L))).collect()
    }
    assert(e.getMessage != null)
  }

  test("Ln9Sat equals the former least-capped element_at (text_lm_score's table)") {
    import spark.implicits._
    val LmMaxC = 4096
    val lnTable: IndexedSeq[Long] = IndexedSeq.tabulate(LmMaxC + 1)(i =>
      if (i < 1) 0L else math.floor(math.log(i.toDouble) * 1e9).toLong)
    def oldLn9(c: Column): Column =
      element_at(typedlit(lnTable), (least(c, lit(LmMaxC)) + 1).cast(IntegerType))
    val ns = (Seq(0L, 1L, 2L, 100L, 4095L, 4096L, 4097L, 1L << 40) ++
      (1L to 300L)).distinct
    val rows = ns.toDF("n")
      .select(col("n"), Ln9.sat(col("n"), LmMaxC).as("a"), oldLn9(col("n")).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"sat diverged at n=${r.getLong(0)}"))
  }

  test("Ln9Bounded equals the former try_element_at (text_entropy's table)") {
    import spark.implicits._
    val MaxN = 1024
    val lnTable: IndexedSeq[Long] = IndexedSeq.tabulate(MaxN + 1)(i =>
      if (i < 1) 0L else math.floor(math.log(i.toDouble) * 1e9).toLong)
    def oldLn9(c: Column): Column =
      try_element_at(typedlit(lnTable), (c + 1).cast(IntegerType))
    // 1L << 35 excluded from the comparison: the OLD chain's ANSI
    // (c+1).cast(INT) throws CAST_OVERFLOW beyond int range; the new
    // expression returns NULL (pinned below) — a strict improvement.
    val ns = (Seq(0L, 1L, 1023L, 1024L, 1025L, 5000L) ++
      (1L to 200L)).distinct
    val rows = ns.toDF("n")
      .select(col("n"), Ln9.bounded(col("n"), MaxN).as("a"), oldLn9(col("n")).as("b"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"bounded nullability diverged at n=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2),
          s"bounded diverged at n=${r.getLong(0)}")
    }
    // beyond-int-range count: NULL, where the old ANSI cast crashed
    val big = Seq(1L << 35).toDF("n")
      .select(Ln9.bounded(col("n"), MaxN)).collect()
    assert(big.head.isNullAt(0), "beyond-int count must yield NULL")
  }

  test("consumer plans carry no ln-table literal (KB-sized, not 100s of KB)") {
    val d = TestSpark.sfDir
    Seq(graft.operators.Sampling.mixKl, graft.operators.Select.nbClassify,
      graft.operators.TextAnalysis.entropy,
      graft.operators.TextAnalysis.lmScore).foreach { q =>
      val plan = q.fn(spark, d).queryExecution.optimizedPlan.toString
      assert(plan.length < 100 * 1024,
        s"${q.name} optimized plan still literal-bloated: ${plan.length} bytes")
      // the 4096-entry table's last value would appear verbatim if inlined
      assert(!plan.contains("8317766166"),
        s"${q.name} plan still inlines the ln table")
    }
  }
}

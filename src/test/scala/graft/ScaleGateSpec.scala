package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives the scale-tier invariant gate ([[ScaleGate]]) end-to-end on
  * a cheap 3x derivation of sf0.01 — the same derivation + check code
  * the 100x artifact run uses, so `sbt test` exercises every family
  * law and the gate cannot rot between probe rounds. Includes
  * negative cases: a gate that cannot fail is not a gate.
  */
class ScaleGateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.01"
  private val out = "/tmp/graft_scale3_sf001"
  private val copies = 3

  test("every gated family law holds on the 3x sf0.01 derivation") {
    ScaleCorpus.ensure(spark, src, out, copies)
    val family = ScaleGate.gatedQueries().filter(SparkEntry.queries.contains)
    // every gated query must actually be registered — a typo'd gate
    // list would silently skip a family
    assert(family.size == ScaleGate.gatedQueries().size,
      s"gated queries missing from the registry: " +
        ScaleGate.gatedQueries().filterNot(SparkEntry.queries.contains))
    val checks = ScaleGate.checksFor(spark, src, out, copies, family)
    assert(checks.size >= 30, s"expected a full check sweep, got ${checks.size}")
    val failed = checks.filterNot(_.pass)
    assert(failed.isEmpty, "violated scale invariants:\n" + failed
      .map(c => s"  ${c.query}: ${c.invariant} (${c.detail})").mkString("\n"))
  }

  test("the linearity law actually fails under a wrong factor (negative case)") {
    ScaleCorpus.ensure(spark, src, out, copies)
    // claim the 3x corpus is 2x: every linearity check must FAIL
    val checks = ScaleGate.checksFor(spark, src, out, copies = 2,
      Seq("q_scd2"))
    assert(checks.nonEmpty && checks.forall(!_.pass),
      s"a wrong factor must violate linearity: $checks")
  }

  test("a stamped dir refuses reuse under a different source (r14 advice)") {
    // a factor-only stamp reused under a different SPARK_GRAFT_SF_DIR
    // would silently serve tables derived from the OLD source — the
    // stamp now records the source and refuses the mismatch the same
    // way it refuses a mixed factor
    ScaleCorpus.ensure(spark, src, out, copies)
    val e = intercept[IllegalArgumentException] {
      ScaleCorpus.ensure(spark, "/root/testdata/sf0.001", out, copies)
    }
    assert(e.getMessage.contains("mixed-source"), e.getMessage)
  }

  test("a pre-r15 factor-only stamp is treated as unstamped and upgraded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_up")
    try {
      // old-format stamp (factor only, source unknowable) + a leftover
      // table: the derivation must NOT trust either — full re-derive,
      // then a two-line stamp
      java.nio.file.Files.write(dir.resolve("derived_copies.txt"),
        "2\n".getBytes("UTF-8"))
      ScaleCorpus.ensure(spark, "/root/testdata/sf0.001", dir.toString, 2)
      val lines = new String(java.nio.file.Files.readAllBytes(
        dir.resolve("derived_copies.txt")), "UTF-8")
        .split("\n").map(_.trim).filter(_.nonEmpty)
      assert(lines.length == 2 && lines(0) == "2" &&
        lines(1).endsWith("sf0.001"), lines.mkString("|"))
      // and the derived corpus is real: documents scaled 2x
      val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
      val scaled = spark.read.parquet(s"$dir/documents.parquet").count()
      assert(scaled == 2 * base)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("the NTILE law rejects a shifted allocation (negative case)") {
    // 23 rows over 4 buckets: law is 6/6/6/5 — 5/6/6/6 must fail
    val good = ScaleGate.ntileLaw("t", Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 5L)), 4)
    assert(good.forall(_.pass), s"law must accept its own allocation: $good")
    val shifted = ScaleGate.ntileLaw("t", Seq((1L, 5L), (2L, 6L), (3L, 6L), (4L, 6L)), 4)
    assert(shifted.exists(!_.pass), "a shifted allocation must fail")
    val eleventh = ScaleGate.ntileLaw("t",
      Seq((1L, 3L), (2L, 2L), (3L, 2L), (4L, 2L), (5L, 2L), (6L, 2L),
        (7L, 2L), (8L, 2L), (9L, 2L), (10L, 2L), (11L, 2L)), 10)
    assert(eleventh.exists(!_.pass),
      "an eleventh bucket (the literal r13 bug) must fail the id check")
  }
}

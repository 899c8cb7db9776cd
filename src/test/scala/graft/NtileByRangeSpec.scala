package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Unit edges of [[graft.plans.GraftOps.ntileByRange]] — the shared
  * global-NTILE body behind q_decile and classify_calibration. The
  * oracle gate proves it against DuckDB's NTILE at corpus sizes; these
  * pin the arithmetic edges a corpus never hits.
  */
class NtileByRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(n: Int) = {
    import spark.implicits._
    // ids deliberately unsorted on write: the helper must establish
    // the global order itself
    (0 until n).map(i => ((i * 7919) % n).toLong).toDF("v")
  }

  test("fewer rows than buckets: first n buckets get one row each (_q = 0 branch)") {
    val out = graft.plans.GraftOps.ntileByRange(df(7), Seq(col("v")), 10)
      .orderBy("v").collect()
    assert(out.map(_.getLong(1)).toSeq == (1L to 7L),
      "7 rows over 10 buckets must land one per bucket in sort order")
  }

  test("uneven split follows the NTILE rule: first n%b buckets get the extra row") {
    val out = graft.plans.GraftOps.ntileByRange(df(23), Seq(col("v")), 4)
      .groupBy("bucket").count().orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 5L)),
      s"23 rows over 4 buckets must split 6/6/6/5, got $out")
  }

  test("bucket assignment respects the sort order exactly") {
    val out = graft.plans.GraftOps.ntileByRange(df(20), Seq(col("v")), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.foreach { case (v, b) =>
      assert(b == v / 5 + 1, s"value $v (rank ${v + 1}) must sit in bucket ${v / 5 + 1}, got $b")
    }
  }

  test("refuses an input that already carries a bucket column") {
    val in = df(5).withColumnRenamed("v", "bucket")
    val e = intercept[IllegalArgumentException] {
      graft.plans.GraftOps.ntileByRange(in, Seq(col("bucket")), 2)
    }
    assert(e.getMessage.contains("bucket"))
  }

  test("refuses an input that collides with the helper's working columns") {
    // an input already carrying _rank (or any internal name) would
    // silently mis-rank or lose the caller's column to the final drop
    for (bad <- Seq("_mid", "_pid", "_lrn", "_offset", "_rank", "_q", "_r", "_n")) {
      val in = df(5).withColumn(bad, col("v"))
      val e = intercept[IllegalArgumentException] {
        graft.plans.GraftOps.ntileByRange(in, Seq(col("v")), 2)
      }
      assert(e.getMessage.contains(bad), s"$bad must be refused: ${e.getMessage}")
    }
  }
}

package graft

import graft.functions.SimHashAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("majority-bit semantics, including exact-half ties -> 0") {
    import spark.implicits._
    // bit 0: set in 2/3 rows -> 1; bit 1: set in 1/3 -> 0;
    // bit 2: set in all -> 1
    val df = Seq(0x5L, 0x4L, 0x7L).toDF("h") // 101, 100, 111
    val fp = df.groupBy().agg(SimHashAgg.simhash60(col("h")).as("fp"))
      .collect().head.getLong(0)
    assert(fp == 0x5L, s"got ${fp.toBinaryString}")
    // exact half (1 of 2) is NOT a majority -> bit stays 0
    val tie = Seq(0x1L, 0x0L).toDF("h")
      .groupBy().agg(SimHashAgg.simhash60(col("h")).as("fp"))
      .collect().head.getLong(0)
    assert(tie == 0L)
  }

  test("matches the 60-column sum(CASE) formulation on real hashes") {
    val h = graft.operators.TextAnalysis.hash60(col("text"))
    // not-null guard: the sum(CASE) reference would count a null hash
    // as -1 per bit while the aggregate skips nulls
    val base = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), (col("doc_id") % 7).as("grp"), h.as("h"))
      .filter(col("h").isNotNull)
    val viaAgg = base.groupBy("grp")
      .agg(SimHashAgg.simhash60(col("h")).as("fp"))
    val bitSums = (0 until 60).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"s$b"))
    val viaCols = base.groupBy("grp")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("grp"),
        (0 until 60).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("fp"))
    val a = viaAgg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = viaCols.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}

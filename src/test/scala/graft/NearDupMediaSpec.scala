package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** multimodal_near_dup is rows-only at the driver (the decode path is
  * not SQL-expressible), so this spec is its correctness gate.
  */
class NearDupMediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("byte-exact duplicates always share a perceptual bucket") {
    // exact dups have identical bytes => identical features => the
    // perceptual grouping must be a coarsening of the exact one
    val out = SparkEntry.queries("multimodal_near_dup")(spark, d)
      .select(col("doc_id"), col("phash"))
    val exact = Tables.documents(spark, d)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val joined = out.join(exact, "doc_id")
    val split = joined.groupBy("h")
      .agg(countDistinct(col("phash")).as("n"))
      .filter(col("n") > 1)
    assert(split.count() == 0,
      "an exact-dup group must never split across perceptual buckets")
  }

  test("a flipped trailing byte still groups with the original") {
    val base = Array.tabulate[Byte](2048)(i => (i % 251).toByte)
    val perturbed = base.clone()
    perturbed(2047) = (perturbed(2047) ^ 1).toByte
    assert(Multimodal.pHashOf(base) == Multimodal.pHashOf(perturbed),
      "a one-byte perturbation must not move the coarse bucket")
    // while a structurally different payload does move
    val different = Array.tabulate[Byte](2048)(i => ((i * 7) % 256).toByte)
    assert(Multimodal.pHashOf(base) != Multimodal.pHashOf(different))
  }

  test("every doc appears once with exactly one keeper per group") {
    val out = SparkEntry.queries("multimodal_near_dup")(spark, d).cache()
    try {
      assert(out.count() == Tables.documents(spark, d).count())
      val bad = out.groupBy("mime", "phash")
        .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("keepers"),
          max(col("group_size")).as("gs"), count(lit(1)).as("n"))
        .filter(col("keepers") =!= 1 || col("gs") =!= col("n"))
      assert(bad.count() == 0)
    } finally out.unpersist()
  }
}

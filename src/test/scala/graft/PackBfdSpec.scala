package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pack_bfd is rows-only at the driver (a sequential fold is not
  * SQL-expressible), so this spec is its correctness gate.
  */
class PackBfdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  private val Cap = 512L

  private lazy val out = SparkEntry.queries("pack_bfd")(spark, d)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)

  test("no bin exceeds capacity and every doc appears exactly once") {
    val over = out.groupBy("lang", "shard", "bin_id")
      .agg(sum(col("n_tokens")).as("fill"))
      .filter(col("fill") > Cap)
    assert(over.count() == 0, "a bin overflowed its capacity")
    assert(out.count() == Tables.documents(spark, d).count())
    assert(out.select("doc_id").distinct().count() == out.count())
  }

  test("token conservation: packed tokens equal capped input tokens") {
    val packed = out.agg(sum(col("n_tokens"))).head.getLong(0)
    val input = Tables.documents(spark, d)
      .select(least(size(split(col("text"), " ")).cast("long"), lit(Cap)).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(packed == input)
  }

  test("fill efficiency beats one-doc-per-bin and sits near the lower bound") {
    val perShard = out.groupBy("lang", "shard")
      .agg(countDistinct(col("bin_id")).as("bins"), sum(col("n_tokens")).as("tok"))
      .collect()
    val bins = perShard.map(_.getAs[Long]("bins")).sum
    val docs = out.count()
    assert(bins < docs, "BFD must merge documents into shared bins")
    // hierarchical BFD wastes at most ~one partial bin per (lang, shard)
    // group vs the global ceil(total/cap) bound
    val lowerBound = perShard.map(r => (r.getAs[Long]("tok") + Cap - 1) / Cap).sum
    assert(bins <= lowerBound + perShard.length,
      s"bins=$bins lower=$lowerBound groups=${perShard.length}")
  }

  test("deterministic across runs") {
    val again = SparkEntry.queries("pack_bfd")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(again == out.collect().map(_.toSeq).toSet)
  }
}

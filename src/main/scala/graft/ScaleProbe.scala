package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: decompose the simhash shuffle growth — candidate
  * pair counts and per-stage volumes at base vs 10x.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale10")) {
      val fps = operators.Dedup.simhashWideFps(spark, d)
      val blocked = fps.select(col("doc_id"),
        explode(array(
          struct(lit(0).as("b"), col("fpl").bitwiseAND((1L << 30) - 1).as("v")),
          struct(lit(1).as("b"), shiftright(col("fpl"), 30).bitwiseAND((1L << 30) - 1).as("v")),
          struct(lit(2).as("b"), col("fph").bitwiseAND((1L << 30) - 1).as("v")),
          struct(lit(3).as("b"), shiftright(col("fph"), 30).bitwiseAND((1L << 30) - 1).as("v")))).as("bb"))
        .select(col("doc_id"), col("bb.b"), col("bb.v"))
      // narrow = D4's 4x15-bit blocks over the SAME fpl (identical fp)
      val narrowBlocked = fps.select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"), shiftright(col("fpl"), b * 15)
            .bitwiseAND((1L << 15) - 1).as("v"))): _*)).as("bb"))
        .select(col("doc_id"), col("bb.b"), col("bb.v"))
      val nStats = narrowBlocked.groupBy("b", "v").count()
        .agg(count(lit(1)), max("count"),
          sum(expr("count * (count - 1) div 2"))).collect()(0)
      System.err.println(s"[probe] $d NARROW buckets=${nStats.getLong(0)} " +
        s"maxBucket=${nStats.getLong(1)} candPairs=${nStats.getLong(2)}")
      val buckets = blocked.groupBy("b", "v").count()
      val stats = buckets.agg(count(lit(1)).as("n_buckets"),
        max("count").as("max_bucket"),
        sum(expr("count * (count - 1) div 2")).as("cand_pairs")).collect()(0)
      val nDocs = fps.count()
      // distinct shingle rows = the fp-stage shuffle driver (recompute
      // the same word-3-shingle explode inline; private in Dedup)
      val shingles = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, greatest(size(w) - 3, 0)), i -> concat_ws(' ', slice(w, i + 1, 3)))")).as("g0"))
        .distinct().count()
      System.err.println(s"[probe] $d docs=$nDocs shingleRows=$shingles " +
        s"buckets=${stats.getLong(0)} maxBucket=${stats.getLong(1)} candPairs=${stats.getLong(2)}")
    }
    spark.stop()
  }
}

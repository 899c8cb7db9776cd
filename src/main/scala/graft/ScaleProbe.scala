package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only probe (not part of the driver contract): decompose the
  * candidate-pair scaling laws of the two measured quadratic risks —
  * simhash pigeonhole blocks and embedding LSH bands — at every scale
  * tier present on disk (base sf0.1, 10x, 100x from ScaleRehearsal).
  * Candidate volume is computed from bucket HISTOGRAMS (Σ c·(c−1)/2),
  * never by enumerating pairs, so the probe itself stays linear and
  * runs at any tier.
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
    val dirs = (if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale10", "/tmp/graft_scale100"))
      .filter(d => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$d/documents.parquet")))

    def bucketLaw(rows: DataFrame, keys: Seq[String]): (Long, Long, Long) = {
      val r = rows.groupBy(keys.map(col): _*).count()
        .agg(count(lit(1)), max("count"),
          sum(expr("count * (count - 1) div 2"))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    for (d <- dirs) {
      // --- simhash: D4's 4x15-bit blocks vs D4b's 4x30-bit blocks,
      //     both over the SAME fingerprints ---
      val fps = operators.Dedup.simhashWideFps(spark, d).localCheckpoint()
      val nDocs = fps.count()
      val wide = fps.select(col("doc_id"),
        explode(array(
          struct(lit(0).as("b"), col("fpl").bitwiseAND((1L << 30) - 1).as("v")),
          struct(lit(1).as("b"), shiftright(col("fpl"), 30).bitwiseAND((1L << 30) - 1).as("v")),
          struct(lit(2).as("b"), col("fph").bitwiseAND((1L << 30) - 1).as("v")),
          struct(lit(3).as("b"), shiftright(col("fph"), 30).bitwiseAND((1L << 30) - 1).as("v")))).as("bb"))
        .select(col("bb.b"), col("bb.v"))
      val narrow = fps.select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"), shiftright(col("fpl"), b * 15)
            .bitwiseAND((1L << 15) - 1).as("v"))): _*)).as("bb"))
        .select(col("bb.b"), col("bb.v"))
      val (nb, nm, nc) = bucketLaw(narrow, Seq("b", "v"))
      val (wb, wm, wc) = bucketLaw(wide, Seq("b", "v"))
      System.err.println(s"[probe] $d docs=$nDocs SIMHASH " +
        s"narrow(15b): buckets=$nb maxBucket=$nm candPairs=$nc | " +
        s"wide(30b): buckets=$wb maxBucket=$wm candPairs=$wc")

      // --- embedding LSH bands: the hi-tau corpus under 16x8-bit
      //     (the registered dedup_embedding_hi banding) vs 8x16-bit
      //     (the bits ~ 2·log2 n widening the Scaladoc prescribes) ---
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$d/embeddings.parquet"))) {
        for ((bands, bits) <- Seq((16, 8), (8, 16))) {
          val br = operators.Similarity.hiBandRows(spark, d, bands, bits)
          val (eb, em, ec) = bucketLaw(br, Seq("band_id", "band_val"))
          val nVec = spark.read.parquet(s"$d/embeddings.parquet").count()
          System.err.println(s"[probe] $d vecs=$nVec EMB bands=${bands}x${bits}b: " +
            s"buckets=$eb maxBucket=$em candPairs=$ec")
        }
      }
    }
    spark.stop()
  }
}

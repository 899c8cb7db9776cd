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

      // --- embedding LSH bands: the registered fixed widths (16x8 =
      //     dedup_embedding_hi, 8x16 = the same planes re-split) vs
      //     the LOG-SCALED plan dedup_embedding_wide derives from the
      //     tier's corpus size. Alongside the candidate law, measure
      //     RECALL on the known true pairs — the augmentation copies
      //     (i, i + copyOffset) — via a band-match equi-join (linear),
      //     since all-pairs truth is unreachable at the 100x tier:
      //     a fixed width stays recall-perfect but goes quadratic in
      //     candidates; the log-scaled width must hold >= ~0.98 recall
      //     while candidates stay ~n·bands(n).
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$d/embeddings.parquet"))) {
        val nVec = spark.read.parquet(s"$d/embeddings.parquet").count()
        val widePlan = graft.functions.Hyperplanes.wideBandPlan(2L * nVec)
        val off = operators.Similarity.copyOffset
        for ((tag, (bands, bits)) <- Seq(
            "fixed16x8" -> ((16, 8)), "fixed8x16" -> ((8, 16)),
            s"wide${widePlan._1}x${widePlan._2}" -> widePlan)) {
          val br = operators.Similarity.hiBandRows(spark, d, bands, bits)
            .localCheckpoint()
          val (eb, em, ec) = bucketLaw(br, Seq("band_id", "band_val"))
          // original ids come from the source table (the derived
          // replica tiers shift ids by k·1e9, so a `< copyOffset`
          // filter would keep only replica 0); a copy's id is always
          // original + copyOffset, disjoint from every original range
          val origIds = spark.read.parquet(s"$d/embeddings.parquet")
            .select("vec_id")
          val orig = br.join(origIds, Seq("vec_id"))
          val cop = br.select(col("band_id"), col("band_val"),
              (col("vec_id") - off).as("vec_id"))
            .join(origIds, Seq("vec_id"))
          val hit = orig.join(cop, Seq("band_id", "band_val", "vec_id"))
            .select("vec_id").distinct().count()
          System.err.println(s"[probe] $d vecs=$nVec EMB $tag bands=${bands}x${bits}b: " +
            s"buckets=$eb maxBucket=$em candPairs=$ec " +
            f"copyPairBandRecall=${hit.toDouble / nVec}%.4f")
        }
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only probe (not part of the driver contract): the >100x
  * embedding tier BY PROBE, not corpus (r7 verdict item 8).
  *
  * The replica-derivation family that built the 10x/100x tiers caps at
  * 2·dim = 128 decorrelated embedding replicas (ScaleRehearsal's
  * shift × sign argument), so a 1000x tier cannot be derived from the
  * shipped corpus — and at ~4M augmented vectors it should not be
  * materialized to disk anyway (the band rows alone outweigh the
  * corpus). Instead this probe measures the dedup_embedding_wide laws
  * on a STREAMED SYNTHETIC id space:
  *
  *  - originals: quantized vectors with iid uniform components in
  *    [-Scale/2, Scale/2] from xxhash64(vec_id, i) — the same
  *    distribution family as the shipped near-orthogonal corpus, which
  *    is the regime the random-collision law bits = ceil(log2 n)
  *    addresses;
  *  - copies: original + an iid jitter with component range
  *    JitFrac · Scale/2, giving E[cosine] = 1/sqrt(1 + JitFrac²)
  *    ~ 0.876 — inside the 0.85-0.9 cosine range of the corpus
  *    tiers' md5-jitter augmentation, so recall here is comparable
  *    with SCALE100_r07's corpus-backed copy_pair_band_recall;
  *  - candidates: bucket histograms (Σ c·(c−1)/2), never pair
  *    enumeration — the probe stays linear in band rows;
  *  - recall: per-copy-pair band agreement on a deterministic 1-in-20
  *    id sample (100k pairs at the 1000x tier — the estimate's
  *    binomial stderr is < 4e-4, far finer than the 0.98 design bar),
  *    because an all-ids band self-join would shuffle ~2x the
  *    candidate histogram for no extra information.
  *
  * Nothing is written to disk; peak footprint is the band-row shuffle
  * of the histogram (~1.1B rows ≈ 30 GB at the 1000x tier — inside
  * the sandbox's free disk where materializing the corpus + running
  * the registered query would not be).
  *
  * Usage: sbt "runMain graft.Tier1000Probe [factor ...]" (default
  * factors: 1000; also accepts 100/10 for law continuity rows against
  * SCALE100_r07's corpus-backed measurements).
  */
object Tier1000Probe {

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "256") // band-row histogram at 1.1B rows
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBase = spark.read.parquet(s"$base/embeddings.parquet").count()
    val dim = graft.functions.Hyperplanes.Dim
    val scale = graft.functions.Hyperplanes.Scale
    // |jitter|/|orig| = JitFrac under iid-uniform components =>
    // E[cos] = 1/sqrt(1 + JitFrac^2); 0.55 -> ~0.876 (the corpus
    // augmentation's 0.85-0.9 range)
    val JitFrac = 0.55
    val jitScale = (scale / 2 * JitFrac).toLong

    /** Synthetic quantized vector column: component i of vec `id`,
      * uniform in [-half, half] from xxhash64 — deterministic,
      * generated on executors, never materialized.
      */
    def synthQa(saltCol: org.apache.spark.sql.Column, half: Long) =
      transform(sequence(lit(1), lit(dim)),
        i => pmod(xxhash64(saltCol, i), lit(2 * half + 1)) - half)

    val lines = factors.map { factor =>
      val nRaw = nBase * factor
      val augN = 2L * nRaw
      val (bands, bits) = graft.functions.Hyperplanes.wideBandPlan(augN)
      System.err.println(
        s"[probe1000] factor=$factor raw=$nRaw augN=$augN plan=${bands}x${bits}b " +
          s"(${bands * bits} planes)")

      // Band rows are a pure function of vec_id, so each measurement
      // GENERATES exactly the ids it needs (nothing cached, nothing
      // on disk): the histogram sees all ids; the recall join only
      // the 1-in-20 sample — regenerating the full corpus for the
      // recall pass would double the probe's dominant cost.
      val CopyOffset = 1L << 40
      def bandRowsFor(ids: DataFrame): DataFrame = {
        val orig = ids.select(col("id").as("vec_id"),
          synthQa(concat(lit("o:"), col("id")), scale / 2).as("qa"))
        val copies = ids.select(
          (col("id") + CopyOffset).as("vec_id"),
          zip_with(
            synthQa(concat(lit("o:"), col("id")), scale / 2),
            synthQa(concat(lit("j:"), col("id")), jitScale),
            (a, b) => a + b).as("qa"))
        orig.unionByName(copies).select(col("vec_id"),
          posexplode(graft.functions.GraftFunctions
            .hyperplaneBands(col("qa"), bands, bits)))
          .select(col("vec_id"), col("pos").as("band_id"), col("col").as("band_val"))
      }

      // ---- candidate law: bucket histogram, one exchange ----
      val t0 = System.nanoTime()
      val h = bandRowsFor(spark.range(nRaw).toDF("id"))
        .groupBy("band_id", "band_val").count()
        .agg(count(lit(1)).as("buckets"), max("count").as("maxBucket"),
          sum(expr("count * (count - 1) div 2")).as("candPairs"))
        .collect()(0)
      val histSec = (System.nanoTime() - t0) / 1e9
      val (buckets, maxBucket, candPairs) =
        (h.getLong(0), h.getLong(1), h.getLong(2))

      // ---- recall at the augmentation operating point: sampled pairs ----
      // 1-in-20 deterministic id sample; join each sampled original's
      // band rows with its copy's on (band_id, band_val)
      val t1 = System.nanoTime()
      val sampled = bandRowsFor(
        spark.range(nRaw).filter(col("id") % 20 === 0).toDF("id"))
      val nSample = nRaw / 20 + (if (nRaw % 20 > 0) 1 else 0)
      val so = sampled.filter(col("vec_id") < CopyOffset)
      val sc = sampled.filter(col("vec_id") >= CopyOffset)
        .select((col("vec_id") - CopyOffset).as("vec_id"),
          col("band_id"), col("band_val"))
      val hits = so.join(sc, Seq("vec_id", "band_id", "band_val"))
        .select("vec_id").distinct().count()
      val recSec = (System.nanoTime() - t1) / 1e9
      val recall = hits.toDouble / nSample

      val line =
        f"""{"tier":"${factor}x","n_raw":$nRaw,"aug_n":$augN,"bands":$bands,"bits":$bits,"planes":${bands * bits},"band_rows":${augN * bands},"buckets":$buckets,"max_bucket":$maxBucket,"cand_pairs":$candPairs,"cand_per_vec":${candPairs.toDouble / augN}%.2f,"recall_sampled":$recall%.4f,"recall_sample_pairs":$nSample,"hist_sec":$histSec%.1f,"recall_sec":$recSec%.1f}"""
      System.err.println(s"[probe1000] $line")
      line
    }
    println(lines.mkString("[", ",\n", "]"))
    spark.stop()
  }
}

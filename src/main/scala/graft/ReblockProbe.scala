package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.EmbStream

/** Dev-only probe (not part of the driver contract): measure the
  * frozen-quantizer MAINTENANCE job ([[EmbStream.reblockIndex]]) at
  * the 100x rehearsal tier, in BOTH regimes, with a verdict-
  * preservation sample — the at-scale evidence for the r13 lifecycle
  * work, the way HierTierProbe is the evidence for the hier operator.
  *
  * What it measures (printed as one JSON line + REBLOCK_r13.json):
  *  - BOOTSTRAP-FROM-STORE: `reblockIndex` against empty target dirs
  *    builds codebook + band index from the accepted-vector store
  *    alone (atomicReplace installs into a nonexistent target), which
  *    doubles as the probe's index setup — and is itself a measured
  *    capability: a lost/corrupt index is rebuilt from the store.
  *  - FLAT RE-BLOCK wall seconds at the 100x store (n = 200k
  *    accepted vectors, k = 782 cells — inside the guard, the
  *    common case).
  *  - HIER RE-BLOCK wall seconds (maxCells seam forces the two-level
  *    regime at the same n — the shape a corpus past the guard pays).
  *  - VERDICT PRESERVATION: a fixed arrival sample (exact copies of
  *    every ~997th accepted vector, fresh ids past the watermark) is
  *    scored against the index BEFORE and AFTER each re-block. Two
  *    levels are reported: DUP-NESS preservation (flagged before ∧
  *    flagged after — the semantic invariant; an exact copy's
  *    original is a guaranteed candidate under ANY codebook, same
  *    vector → same cells) and SAME-PARTNER preservation (the
  *    stricter identity; the partner is the MIN-ID visible verified
  *    candidate, so on a corpus with many ~tau pairs it legitimately
  *    moves with the cell boundaries — flat→flat re-training on an
  *    unchanged store is deterministic, so there it holds exactly).
  *  - Occupancy skew before/after (the `emb_cell_skew` summary via
  *    [[EmbStream.indexCellSkew]]) — the trigger the job answers.
  *
  * The accepted-vector store uses the ScaleRehearsal 100x corpus's
  * SPARSE ids (replica k's ids sit at k·1e9) — exercising the
  * [[Similarity.lowestIdSeeds]] rule at scale, where the dense
  * `vec_id < k` filter would find only replica-0 seeds.
  *
  * Usage: sbt "runMain graft.ReblockProbe" (SPARK_GRAFT_SCALE_DIR for
  * the corpus — run ScaleRehearsal once first to derive it).
  */
object ReblockProbe {

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale100")
    val work = sys.env.getOrElse("SPARK_GRAFT_REBLOCK_DIR", "/tmp/graft_reblock")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_REBLOCK_OUT", "REBLOCK_r13.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    plans.GraftOps.install(spark)
    import java.nio.file.{Files, Paths}
    val workPath = Paths.get(work)
    if (Files.exists(workPath)) {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(work)).deleteRecursively()
    }
    Files.createDirectories(workPath)
    val (centDir, bandDir, vecDir) =
      (s"$work/cent", s"$work/band", s"$work/vec")

    // the accepted-vector store: the 100x corpus, quantized — sparse
    // ids (replica offsets at 1e9 steps)
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select("vec_id", "embedding")
    Similarity.quantizeCols(emb).write.mode("overwrite").parquet(vecDir)
    val q = spark.read.parquet(vecDir)
    val n = q.count()

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def skewRow(): (Long, Double, Boolean) = {
      val r = EmbStream.indexCellSkew(spark, bandDir).collect().head
      (r.getLong(r.fieldIndex("cells")),
        r.getDouble(r.fieldIndex("skew")),
        r.getBoolean(r.fieldIndex("retrain")))
    }
    // fixed arrival sample: exact copies of every ~997th accepted
    // vector, ids past every accepted id (the watermark contract)
    val BigOffset = 1L << 42
    val arrivals = q.filter(col("vec_id") % 997 === 0)
      .select((col("vec_id") + BigOffset).as("vec_id"), col("qa"), col("na"))
      .localCheckpoint()
    val nSample = arrivals.count()
    def verdicts(): Map[Long, Long] = {
      val (cellIds, cents) = EmbStream.readCodebook(spark, centDir)
      EmbStream.dedupBatchBlocked(arrivals,
        spark.read.parquet(bandDir), spark.read.parquet(vecDir),
        cellIds, cents)
        .filter(col("partner_id").isNotNull)
        .select("vec_id", "partner_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    // 1. bootstrap-from-store (targets do not exist yet)
    val (_, bootSec) = timed(
      EmbStream.reblockIndex(spark, centDir, bandDir, vecDir))
    val (cells0, skew0, retrain0) = skewRow()
    val v0 = verdicts()
    val flagged0 = v0.size
    // every *_frac below divides by this: zero flagged arrivals means
    // the sampling scheme found no planted dups to preserve — the
    // probe would emit NaN (invalid JSON) and measure nothing
    require(flagged0 > 0,
      s"no sampled arrival was flagged against the store ($nSample " +
        "arrivals) - the probe's planted-dup sampling found nothing to " +
        "measure on this corpus; widen the sample before re-running")

    // 2. FLAT maintenance re-block (the steady-state job)
    val (_, flatSec) = timed(
      EmbStream.reblockIndex(spark, centDir, bandDir, vecDir))
    val (cells1, skew1, _) = skewRow()
    val v1 = verdicts()
    val keptFlat = v0.count { case (k2, p) => v1.get(k2).contains(p) }
    val dupKeptFlat = v0.keys.count(v1.contains)

    // 3. HIER maintenance re-block (the past-guard regime, seam-forced
    //    at the same n so both regimes are measured on one corpus)
    val (_, hierSec) = timed(
      EmbStream.reblockIndex(spark, centDir, bandDir, vecDir,
        maxCells = 256))
    val cbAfter = EmbStream.loadCodebook(spark, centDir)
    require(cbAfter == EmbStream.HierCodebook,
      s"expected a hier codebook after the seam-forced re-block, got $cbAfter")
    // the require above means an emitted line always reads true; the
    // field is retained for artifact-shape stability
    val isHier = true
    // hier codebook: the LITERAL production tail
    // (EmbStream.dedupBatchBlockedFrom, same as v0/v1's path) over the
    // joined-table assignment — a prior revision inlined ~20 lines of
    // the candidate/verify chain here and had already drifted from the
    // loop's semantics (r13 review: the copy omitted the arrivals' own
    // band rows and the batch side of the verify union)
    val v2 = {
      val (supLive, children) = EmbStream.hierCodebookFrames(spark, centDir)
      val qc = arrivals.join(
        Similarity.hierCellsOf(arrivals, supLive, children,
          Similarity.blockProbe).select("vec_id", "cells"), "vec_id")
        .select(col("vec_id"), col("cells"), col("qa"))
      EmbStream.dedupBatchBlockedFrom(arrivals, qc,
        spark.read.parquet(bandDir), spark.read.parquet(vecDir),
        Similarity.nearDupTau)
        .filter(col("partner_id").isNotNull)
        .select("vec_id", "partner_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val keptHier = v0.count { case (k2, p) => v2.get(k2).contains(p) }
    val dupKeptHier = v0.keys.count(v2.contains)

    val line =
      f"""{"n":$n,"cells_flat":$cells0,"bootstrap_sec":$bootSec%.1f,"flat_reblock_sec":$flatSec%.1f,"hier_reblock_sec":$hierSec%.1f,"hier_codebook":$isHier,"sample_arrivals":$nSample,"sample_flagged":$flagged0,"dup_kept_flat":$dupKeptFlat,"dup_kept_hier":$dupKeptHier,"dup_kept_flat_frac":${dupKeptFlat.toDouble / flagged0}%.4f,"dup_kept_hier_frac":${dupKeptHier.toDouble / flagged0}%.4f,"same_partner_flat_frac":${keptFlat.toDouble / flagged0}%.4f,"same_partner_hier_frac":${keptHier.toDouble / flagged0}%.4f,"skew_before":$skew0%.2f,"skew_after_flat":$skew1%.2f,"retrain_flag_initial":$retrain0,"cells_after_flat":$cells1}"""
    println(line)
    Files.write(Paths.get(outFile), (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

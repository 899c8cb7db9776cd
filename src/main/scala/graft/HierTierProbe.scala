package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity

/** Dev-only probe (not part of the driver contract): hier's PAYING
  * tier — k just past [[graft.operators.Similarity.MaxBlockCells]],
  * the first regime where `dedup_embedding_blocked`'s flat Lloyd
  * assignment is REFUSED and the two-level `dedup_embedding_hier` is
  * the only registered path (r10/r11 verdict task: the structural
  * crossover argument, turned into a measurement the way
  * BlockPlanProbe priced flat's crash).
  *
  * Same synthetic methodology as [[Tier1000Probe]] (streamed
  * xxhash-derived id space — nothing written to disk; originals iid
  * uniform on the quantization grid, copies jittered to E[cos] ≈
  * 0.876, inside the corpus tiers' 0.85-0.9 augmentation range), but
  * the corpus flows through the EXACT registered assignment dataflow
  * ([[Similarity.hierAssignFrom]] — the refactor seam), so the
  * numbers are the operator's, not a re-implementation's:
  *
  *  - guard proof: requireBlockCells(k) must THROW at this tier
  *    (flat refused), printed into the artifact;
  *  - assignment cost: wall seconds to materialize the full two-level
  *    assignment (supers -> pinned children -> top-2-probe), plus the
  *    eval accounting n·(1+probe)·sqrt(k) the Scaladoc claims (the
  *    super-scan term k1 ≈ sqrt(k) plus probe child scans);
  *  - candidate volume: in-cell banded bucket histogram
  *    (Σ c·(c−1)/2 over (probed cell, band_id, band_val)) — stage 2's
  *    candidate generation keys, never pair enumeration;
  *  - recall on planted pairs: fraction of sampled original/copy
  *    pairs sharing >= 1 (cell, band) bucket — the in-cell banding
  *    recall INCLUDING the cell-split loss multi-probe exists to
  *    recover (1-in-20 deterministic id sample, binomial stderr
  *    < 1e-3 at the default tier);
  *  - state sizes: super broadcast (k1·Dim longs) and the child
  *    joined table (k·(Dim+2) longs) — the placement that replaces
  *    flat's driver collect + plan payload.
  *
  * Usage: SPARK_DRIVER_MEM=64g sbt "runMain graft.HierTierProbe
  * [nRaw ...]" (default 8500000 — k = 66,407 > 2^16; smaller values
  * give law-continuity rows against the corpus-backed tiers).
  * SPARK_GRAFT_HIER_PROBE overrides the multi-probe breadth (default
  * = the registered BlockProbe) — the r12 probe-generic seam, so the
  * documented escape path for the uniform-geometry cell-recall floor
  * can be PRICED at the paying tier (assignment cost grows with the
  * probed-children join; recall recovers cell-split pairs).
  */
object HierTierProbe {

  def main(args: Array[String]): Unit = {
    val tiers = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(8500000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "256")
      // Broadcast threshold stays at Spark's 10 MB DEFAULT. A first
      // cut raised it to 256 MB so the ~35 MB k-row child table would
      // broadcast — and crashed: the optimizer then also broadcast the
      // n-scaled (vec_id, super) probe frame (estimate under the
      // threshold, actual serialized size 1+ GB > maxResultSize). The
      // operator's k1-row frames carry explicit broadcast() hints, so
      // the default threshold costs nothing there, and the child-table
      // join running as a shuffle join is exactly the documented
      // at-scale state placement ("an n-row equi-join at the 1e9
      // tier") — the probe should measure THAT plan, not a
      // driver-inflating broadcast no cluster would survive.
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dim = graft.functions.Hyperplanes.Dim
    val scale = graft.functions.Hyperplanes.Scale
    val JitFrac = 0.55 // E[cos] = 1/sqrt(1 + 0.55^2) ~ 0.876
    val jitScale = (scale / 2 * JitFrac).toLong
    val CopyOffset = 1L << 40

    def synthQa(saltCol: org.apache.spark.sql.Column, half: Long) =
      transform(sequence(lit(1), lit(dim)),
        i => pmod(xxhash64(saltCol, i), lit(2 * half + 1)) - half)

    /** Synthetic augmented corpus of the registered shape (vec_id, qa,
      * na): originals on dense ids 0..n-1 (hierAssignFrom seeds from
      * the first k1/k ids), copies at id + 2^40.
      */
    def augFor(nRaw: Long): DataFrame = {
      val ids = spark.range(nRaw).toDF("id")
      val orig = ids.select(col("id").as("vec_id"),
        synthQa(concat(lit("o:"), col("id")), scale / 2).as("qa"))
      val copies = ids.select(
        (col("id") + CopyOffset).as("vec_id"),
        zip_with(
          synthQa(concat(lit("o:"), col("id")), scale / 2),
          synthQa(concat(lit("j:"), col("id")), jitScale),
          (a, b) => a + b).as("qa"))
      orig.unionByName(copies)
        .withColumn("na", Similarity.dotCol(col("qa"), col("qa")))
    }

    val (bands, bits) = Similarity.blockBandPlan
    val probe = sys.env.get("SPARK_GRAFT_HIER_PROBE").map(_.toInt)
      .getOrElse(Similarity.blockProbe)

    val lines = tiers.map { nRaw =>
      val augN = 2L * nRaw
      val cap = Similarity.cellCap
      val k = (((augN + cap - 1) / cap) max 2L)
      val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
      // the tier's defining fact: flat is REFUSED here
      val flatRefused =
        try { Similarity.requireBlockCells(k); false }
        catch { case _: IllegalArgumentException => true }
      System.err.println(
        s"[probeHier] nRaw=$nRaw augN=$augN k=$k k1=$k1 " +
          s"flat_refused=$flatRefused plan=${bands}x${bits}b probe=$probe")

      // ---- assignment through the registered dataflow ----
      val t0 = System.nanoTime()
      val assign = Similarity
        .hierAssignFrom(spark, augFor(nRaw), augN, probe)
        .localCheckpoint() // eager: forces the full assignment
      val assignSec = (System.nanoTime() - t0) / 1e9
      val aCnt = assign.count()
      require(aCnt == augN, s"assignment lost vectors: $aCnt != $augN")

      // primary-cell occupancy (skew check: CellCap is an expectation)
      val occ = assign.groupBy("cell").count()
        .agg(count(lit(1)).as("cells"), max("count").as("maxCell"))
        .collect()(0)
      val (liveCells, maxCell) = (occ.getLong(0), occ.getLong(1))

      // ---- candidate volume: stage-2 keys, histogram only ----
      val t1 = System.nanoTime()
      def bandedOf(df: DataFrame): DataFrame = df.select(
        col("vec_id"), col("cells"),
        posexplode(graft.functions.GraftFunctions
          .hyperplaneBands(col("qa"), bands, bits)))
        .select(col("vec_id"), explode(col("cells")).as("bcell"),
          col("pos").as("band_id"), col("col").as("band_val"))
      val h = bandedOf(assign)
        .groupBy("bcell", "band_id", "band_val").count()
        .agg(count(lit(1)).as("buckets"), max("count").as("maxBucket"),
          sum(expr("count * (count - 1) div 2")).as("candPairs"))
        .collect()(0)
      val histSec = (System.nanoTime() - t1) / 1e9
      val (buckets, maxBucket, candPairs) =
        (h.getLong(0), h.getLong(1), h.getLong(2))

      // ---- planted-pair recall under in-cell banding ----
      val t2 = System.nanoTime()
      val so = bandedOf(assign.filter(
        col("vec_id") < CopyOffset && col("vec_id") % 20 === 0))
      val sc = bandedOf(assign.filter(col("vec_id") >= CopyOffset &&
        (col("vec_id") - CopyOffset) % 20 === 0))
        .select((col("vec_id") - CopyOffset).as("vec_id"),
          col("bcell"), col("band_id"), col("band_val"))
      val hits = so.join(sc, Seq("vec_id", "bcell", "band_id", "band_val"))
        .select("vec_id").distinct().count()
      // decomposition: how much of the miss is CELL separation (the
      // pair shares no probed cell — banding never gets to see it)
      // vs band disagreement within a shared cell
      val cellHits = assign
        .filter(col("vec_id") < CopyOffset && col("vec_id") % 20 === 0)
        .select(col("vec_id"), col("cells"))
        .join(assign.filter(col("vec_id") >= CopyOffset &&
          (col("vec_id") - CopyOffset) % 20 === 0)
          .select((col("vec_id") - CopyOffset).as("vec_id"),
            col("cells").as("cells2")), "vec_id")
        .filter(arrays_overlap(col("cells"), col("cells2")))
        .count()
      val recSec = (System.nanoTime() - t2) / 1e9
      val nSample = nRaw / 20 + (if (nRaw % 20 > 0) 1 else 0)
      val recall = hits.toDouble / nSample
      val cellRecall = cellHits.toDouble / nSample

      assign.unpersist()
      val superBytes = k1.toLong * dim * 8
      val childBytes = k * (dim + 2) * 8
      val line =
        f"""{"n_raw":$nRaw,"aug_n":$augN,"k":$k,"k1":$k1,"probe":$probe,"flat_refused":$flatRefused,"assign_sec":$assignSec%.1f,"evals_per_vec_law":${(1 + probe) * math.sqrt(k.toDouble)}%.0f,"super_state_bytes":$superBytes,"child_state_bytes":$childBytes,"live_cells":$liveCells,"max_cell":$maxCell,"bands":$bands,"bits":$bits,"band_rows":${augN * probe * bands},"buckets":$buckets,"max_bucket":$maxBucket,"cand_pairs":$candPairs,"cand_per_vec":${candPairs.toDouble / augN}%.2f,"recall_sampled":$recall%.4f,"cell_recall_sampled":$cellRecall%.4f,"recall_sample_pairs":$nSample,"hist_sec":$histSec%.1f,"recall_sec":$recSec%.1f}"""
      System.err.println(s"[probeHier] $line")
      line
    }
    println(lines.mkString("[", ",\n", "]"))
    spark.stop()
  }
}

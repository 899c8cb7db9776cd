package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming embedding near-dup deduplication — the LIVE SemDeDup
  * shape: vectors arrive on a stream and are deduped against
  * everything already accepted, the embedding-space counterpart of
  * [[DocStream]]'s minhash index loop and the streaming twin of the
  * batch `dedup_embedding` / `dedup_embedding_keep` queries. It shares
  * the batch operators' quantization, hyperplane banding, and verify
  * threshold through [[graft.operators.Similarity]]'s column helpers,
  * so live and batch verdicts cannot drift.
  *
  * Architecture (same MERGE-loop shape as [[DocStream]] — state is
  * DATA on storage, not a state store): the cross-batch memory is TWO
  * tables, the band index (vec_id, band_id, band_val) for candidate
  * generation and the accepted-vector store (vec_id, qa, na) for the
  * exact verify (the one piece the minhash loop does not need: a
  * banded candidate is only a duplicate if the EXACT quantized cosine
  * clears tau). Each micro-batch, inside `foreachBatch`:
  *
  *  1. quantize the arriving vectors (per-row, no shuffle);
  *  2. band equi-join against index ∪ batch bands, `j < i` (dups vs
  *     the accepted corpus and within the batch, first copy wins);
  *  3. exact cosine rerank of the candidates against the accepted
  *     vectors ∪ batch vectors; survivors of tau get their min-id
  *     partner;
  *  4. verdicts OVERWRITE their own `batch=<id>` partition of
  *     `verdictsDir` — every vec, with its surviving partner +
  *     cosine or NULLs;
  *  5. the SURVIVORS' band rows and vectors appended to the index,
  *     so later batches dedup against them.
  *
  * Failure semantics mirror [[DocStream]]: a replayed batch re-reads
  * an index that may already contain its survivors — harmless (strict
  * `<` excludes the self-pair; duplicate index rows cannot change the
  * min-struct partner) — so verdict VALUES are replay-stable, and
  * verdict ROWS are exactly-once because each batch overwrites its
  * own `batch=<id>` partition dir; the index/vector appends stay
  * at-least-once by the min-struct argument.
  *
  * "Deduped against everything already accepted" additionally assumes
  * vec_ids are MONOTONICALLY INCREASING across the bootstrap corpus
  * and the stream: strict `j < i` keeps the first copy as the
  * smallest id, so a late-arriving vector with an id SMALLER than an
  * accepted near-dup's would be admitted as a second survivor.
  *
  * At scale: the band join carries (vec_id, band_id, band_val) only —
  * 16 rows of three longs per vector, never the vector; vectors are
  * fetched once per VERIFIED-CANDIDATE id on the equi-join back to the
  * stores. The index grows by survivors only. A deployment reads the
  * stream from Kafka and keeps both tables in a table format with
  * compaction; here they are parquet directories.
  *
  * OVERLAPPING-WRITER BOUND: identical to [[DocStream]]'s (see there;
  * IndexOverlapSpec demonstrates both halves on this stream too) —
  * committed plain-parquet appends are never replaced or torn, and
  * duplicated band/vector rows are tolerated (min-struct verdicts are
  * duplicate-stable, so a suspected-partial append is safely
  * re-appended whole), but concurrent commit windows on one dir are
  * unsafe with the vanilla committer (serialize appends per dir, as
  * foreachBatch does), and overlapped read..append windows can admit a
  * near-dup pair twice; table-format optimistic commit is the
  * multi-driver answer, `dedup_embedding_keep` the post-hoc collapse.
  */
object EmbStream {

  /** Bootstrap both stores from an already-deduped corpus
    * (vec_id, embedding). Run once; the stream appends. An empty
    * corpus (`df.limit(0)`) is a valid bootstrap — the schema is
    * still written.
    */
  def writeIndex(corpus: DataFrame, bandDir: String, vecDir: String): Unit = {
    val q = Similarity.quantizeCols(corpus)
    Similarity.dedupBandRows(q).write.mode("overwrite").parquet(bandDir)
    q.write.mode("overwrite").parquet(vecDir)
  }

  /** Per-batch incremental near-dup verdicts (also usable directly on
    * a batch). `batchQ` is quantized (vec_id, qa, na); returns
    * (vec_id, partner_id, partner_cos) where a non-null partner is
    * the min-id earlier vector (index or smaller-id batch vector)
    * whose exact cosine clears `tau`.
    */
  def dedupBatch(
      batchQ: DataFrame, bandIndex: DataFrame, vecs: DataFrame,
      tau: Double = Similarity.nearDupTau): DataFrame = {
    val bandRows = Similarity.dedupBandRows(batchQ)
    val arriving = bandRows
      .select(col("band_id"), col("band_val"), col("vec_id").as("i"))
    val prior = bandIndex.unionByName(bandRows)
      .select(col("band_id"), col("band_val"), col("vec_id").as("j"))
    val cand = arriving.join(prior, Seq("band_id", "band_val"))
      .filter(col("j") < col("i"))
      .select("i", "j").dropDuplicates("i", "j")
    verdictsOf(cand, batchQ, vecs, tau)
  }

  /** Exact-cosine verify + min-id partner + every-arrival outer join —
    * the tail both candidate generators ([[dedupBatch]],
    * [[dedupBatchBlocked]]) share, so the banded and cell-blocked
    * loops cannot drift in verify semantics.
    */
  private def verdictsOf(cand: DataFrame, batchQ: DataFrame,
      vecs: DataFrame, tau: Double): DataFrame = {
    val qi = batchQ
      .select(col("vec_id").as("i"), col("qa").as("qi"), col("na").as("ni"))
    val qj = vecs.unionByName(batchQ)
      .select(col("vec_id").as("j"), col("qa").as("qj"), col("na").as("nj"))
    // min-id partner via the bounded-heap TopKPerKey (k=1), not
    // min(struct(..)): the struct fold plans as SortAggregate — a full
    // sort of the per-batch candidate stream, which scales with the
    // index, not the batch (the same wall HierTierProbe priced batch-
    // side). foreachBatch bodies execute as ordinary batch plans, so
    // the custom operator applies. Ordering: lowest j wins; j is
    // unique per (i, j) candidate after dropDuplicates, so the old
    // struct's cos component never tie-broke — the tie column is j
    // itself, for determinism only.
    val verified = graft.plans.GraftOps.topKPerKey(
      cand.join(qi, "i").join(qj, "j")
        .withColumn("cos",
          Similarity.cosineCol(
            Similarity.dotCol(col("qi"), col("qj")), col("ni"), col("nj")))
        .filter(col("cos") >= tau)
        .select(col("i").as("vec_id"), col("j"), col("cos")),
      Seq(col("vec_id")), -col("j"), col("j"), 1)
      .select(col("vec_id"),
        col("j").as("partner_id"), col("cos").as("partner_cos"))
    batchQ.select(col("vec_id")).join(verified, Seq("vec_id"), "left_outer")
  }

  /** One micro-batch of the near-dup loop: verdicts overwrite their
    * own `batch=<id>` partition dir (so calling it again with the
    * same batchId — a replay — REPLACES the previous output, row
    * counts included; idempotence is spec-proven by invoking this
    * twice), survivors' band rows and vectors append to the stores.
    */
  def processBatch(batch: DataFrame, bandDir: String, vecDir: String,
      verdictsDir: String, batchId: Long,
      tau: Double = Similarity.nearDupTau): Unit = {
    val spark = batch.sparkSession
    val q = Similarity.quantizeCols(batch).persist()
    try {
      IdWatermark.checkAndAdvance(q, "vec_id", bandDir, batchId, "embstream")
      val verdicts = dedupBatch(q,
        spark.read.parquet(bandDir), spark.read.parquet(vecDir), tau)
        .persist()
      try {
        verdicts.write.mode("overwrite")
          .parquet(s"$verdictsDir/batch=$batchId")
        val survivors = q.join(
          verdicts.filter(col("partner_id").isNull).select("vec_id"),
          Seq("vec_id"), "left_semi").persist()
        try {
          Similarity.dedupBandRows(survivors)
            .write.mode("append").parquet(bandDir)
          survivors.write.mode("append").parquet(vecDir)
        } finally survivors.unpersist()
      } finally verdicts.unpersist()
    } finally q.unpersist()
  }

  // --------------------------------------------------------------
  // Cell-blocked variant — the streaming twin of the batch 100-TB
  // default (dedup_embedding_blocked / _hier), closing the shape gap
  // between this loop and the registered batch path: [[writeIndex]]
  // bands the WHOLE corpus under one log(n)-scaled plan, so every
  // arriving vector's band bucket grows with the accepted index and
  // the per-batch join degenerates as it fills. Here candidates are
  // confined to the arrival's blockProbe nearest Lloyd cells under
  // the CONSTANT BlockBands x BlockBits in-cell plan (collisions
  // bounded by the cell cap, not n) — per-arrival candidate work
  // tracks cell occupancy, the same move the batch side measured and
  // registered as its default.
  //
  // The quantizer is TRAINED AT BOOTSTRAP and FROZEN: cells cannot
  // move once index rows cite them (re-assigning would orphan every
  // banded row). Distribution drift therefore costs RECALL, never
  // correctness (verify stays exact cosine) — the standard IVF
  // operating discipline: monitor occupancy skew, retrain + re-index
  // offline when it drifts (the deployment's compaction job), exactly
  // as a batch re-block. Bootstrap k is bounded by requireBlockCells,
  // the same loud guard as the batch path; past that bound the
  // bootstrap assignment moves to the two-level hier join
  // (Similarity.hierAssignFrom) without changing the index schema.
  // --------------------------------------------------------------

  /** Bootstrap the BLOCKED stores from an already-deduped corpus
    * (vec_id, embedding) with ids dense from 0 (the Lloyd seed rule):
    * trains the frozen quantizer (one deterministic Lloyd round —
    * [[Similarity.lloydCells]], the literal batch stage-1 code),
    * writes the codebook to `centDir` in codebook order and the
    * cell-keyed band index to `bandDir`. Run once; the stream appends.
    */
  def writeIndexBlocked(corpus: DataFrame, centDir: String,
      bandDir: String, vecDir: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = Similarity.quantizeCols(corpus).persist()
    try {
      val n = q.count()
      val k = Similarity.requireBlockCells(
        ((n + Similarity.cellCap - 1) / Similarity.cellCap) max 2L)
      val (cellIds, cents) = Similarity.lloydCells(q, k)
      cellIds.zipWithIndex
        .map { case (id, i) => (i, id, cents(i).toSeq) }.toSeq
        .toDF("idx", "cell", "cvec")
        .write.mode("overwrite").parquet(centDir)
      blockedBandRows(q, cellIds, cents)
        .write.mode("overwrite").parquet(bandDir)
      q.write.mode("overwrite").parquet(vecDir)
    } finally q.unpersist()
  }

  /** The frozen codebook back in codebook order — k rows collected to
    * the driver per micro-batch, bounded by the same
    * requireBlockCells ceiling the batch path's stage-1 collect obeys.
    */
  private[graft] def readCodebook(
      spark: org.apache.spark.sql.SparkSession,
      centDir: String): (Array[Long], Array[Array[Long]]) = {
    val rows = spark.read.parquet(centDir)
      .select("idx", "cell", "cvec").collect()
      .sortBy(_.getInt(0))
    (rows.map(_.getLong(1)), rows.map(_.getSeq[Long](2).toArray))
  }

  /** Cell-keyed band rows (vec_id, cell, band_id, band_val): one row
    * per probed cell per band, under the batch side's constant
    * in-cell plan — the quantized vector itself never enters the
    * index.
    */
  private[graft] def blockedBandRows(q: DataFrame,
      cellIds: Array[Long], cents: Array[Array[Long]]): DataFrame = {
    val (bands, bits) = Similarity.blockBandPlan
    q.select(col("vec_id"),
      graft.functions.GraftFunctions.pqCells(
        col("qa"), Array(cents), cellIds, Similarity.blockProbe).as("cells"),
      col("qa"))
      .select(col("vec_id"), explode(col("cells")).as("cell"),
        posexplode(graft.functions.GraftFunctions
          .hyperplaneBands(col("qa"), bands, bits)))
      .select(col("vec_id"), col("cell"),
        col("pos").as("band_id"), col("col").as("band_val"))
  }

  /** [[dedupBatch]] with cell-blocked candidate generation: arrivals
    * meet prior rows only inside a shared probed cell. Verify tail is
    * [[verdictsOf]] — identical exact-cosine semantics to the banded
    * loop and the batch operators.
    */
  def dedupBatchBlocked(
      batchQ: DataFrame, bandIndex: DataFrame, vecs: DataFrame,
      cellIds: Array[Long], cents: Array[Array[Long]],
      tau: Double = Similarity.nearDupTau): DataFrame = {
    val bandRows = blockedBandRows(batchQ, cellIds, cents)
    val arriving = bandRows
      .select(col("cell"), col("band_id"), col("band_val"), col("vec_id").as("i"))
    val prior = bandIndex.unionByName(bandRows)
      .select(col("cell"), col("band_id"), col("band_val"), col("vec_id").as("j"))
    val cand = arriving.join(prior, Seq("cell", "band_id", "band_val"))
      .filter(col("j") < col("i"))
      .select("i", "j").dropDuplicates("i", "j")
    verdictsOf(cand, batchQ, vecs, tau)
  }

  /** One micro-batch of the BLOCKED loop — same exactly-once verdict
    * partitions, at-least-once survivor appends, and replay semantics
    * as [[processBatch]].
    */
  def processBatchBlocked(batch: DataFrame, centDir: String,
      bandDir: String, vecDir: String, verdictsDir: String, batchId: Long,
      tau: Double = Similarity.nearDupTau): Unit = {
    val spark = batch.sparkSession
    val (cellIds, cents) = readCodebook(spark, centDir)
    val q = Similarity.quantizeCols(batch).persist()
    try {
      IdWatermark.checkAndAdvance(q, "vec_id", bandDir, batchId, "embstream")
      val verdicts = dedupBatchBlocked(q,
        spark.read.parquet(bandDir), spark.read.parquet(vecDir),
        cellIds, cents, tau)
        .persist()
      try {
        verdicts.write.mode("overwrite")
          .parquet(s"$verdictsDir/batch=$batchId")
        val survivors = q.join(
          verdicts.filter(col("partner_id").isNull).select("vec_id"),
          Seq("vec_id"), "left_semi").persist()
        try {
          blockedBandRows(survivors, cellIds, cents)
            .write.mode("append").parquet(bandDir)
          survivors.write.mode("append").parquet(vecDir)
        } finally survivors.unpersist()
      } finally verdicts.unpersist()
    } finally q.unpersist()
  }

  /** Start the BLOCKED streaming near-dup loop (bootstrap with
    * [[writeIndexBlocked]] first — the codebook must exist).
    */
  def dedupIndexedStreamBlocked(
      embs: DataFrame, centDir: String, bandDir: String, vecDir: String,
      verdictsDir: String, checkpoint: String,
      tau: Double = Similarity.nearDupTau,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    embs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchBlocked(batch, centDir, bandDir, vecDir, verdictsDir,
          batchId, tau)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Start the streaming near-dup loop. `embs` is a streaming
    * DataFrame of (vec_id LONG, embedding ARRAY<numeric>).
    */
  def dedupIndexedStream(
      embs: DataFrame, bandDir: String, vecDir: String,
      verdictsDir: String, checkpoint: String,
      tau: Double = Similarity.nearDupTau,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    embs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, bandDir, vecDir, verdictsDir, batchId, tau)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

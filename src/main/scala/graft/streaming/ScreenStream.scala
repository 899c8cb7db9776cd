package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming contamination screening — the LIVE counterpart of the
  * batch `decontaminate_winnow` query: documents arrive on a stream
  * and each is screened against a STATIC benchmark fingerprint set
  * before it can enter a training corpus (the admission gate a
  * continuously-ingesting pipeline runs, with the expensive
  * substring pass reserved for flagged docs, exactly as in batch).
  *
  * Architecture: unlike DocStream/EmbStream there is NO cross-batch
  * state — contamination is a property of (document, benchmark) only
  * — so the loop is a stateless per-batch join:
  *
  *  1. winnowed fingerprints for arriving docs via the per-row
  *     [[TextAnalysis.winnowFpsExpr]] column (the SAME expression the
  *     batch oracle formulates, WinnowSpec-pinned — live and batch
  *     verdicts cannot drift);
  *  2. explode + equi-join against the benchmark fingerprint table
  *     (small by construction — it is an eval set — so Spark
  *     broadcasts it; zero stream-side shuffle before the per-doc
  *     count aggregate);
  *  3. verdict rows (doc_id, fps_shared, benchmark_docs — 0/0 for
  *     clean docs) OVERWRITE their own `batch=<id>` partition of
  *     `verdictsDir` (the ScoreStream pattern): replays REPLACE
  *     previous output, so verdict rows are exactly-once.
  *
  * The winnowing guarantee transfers to the live screen: any arriving
  * document sharing a contiguous run of >= w + 2 tokens with any
  * benchmark document shares at least one fingerprint and IS flagged.
  *
  * At scale: the benchmark side is fixed and tiny (broadcast), the
  * stream side is one narrow projection per doc — per-batch cost is
  * proportional to the batch alone, with no growing state anywhere.
  */
object ScreenStream {

  /** Materialize the benchmark fingerprint table (fp, bench_id) —
    * run once when the benchmark set changes; the stream joins it.
    */
  def writeBenchFps(benchDocs: DataFrame, benchDir: String): Unit =
    benchFps(benchDocs).write.mode("overwrite").parquet(benchDir)

  private def benchFps(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("bench_id"),
      explode(TextAnalysis.winnowFpsExpr(col("text"))).as("fp"))
      .distinct()

  /** Screen one batch (also usable directly on a batch DataFrame):
    * verdict rows (doc_id, fps_shared, benchmark_docs) for EVERY
    * arriving doc — zeros mean clean.
    */
  def screenBatch(batch: DataFrame, bench: DataFrame): DataFrame = {
    val fps = batch.select(col("doc_id"),
      explode(TextAnalysis.winnowFpsExpr(col("text"))).as("fp"))
    // the hit counting is Contamination's — batch and live verdicts
    // share one aggregation definition
    batch.select("doc_id")
      .join(graft.operators.Contamination.winnowFpHits(fps, bench),
        Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("fps_shared", "benchmark_docs"))
  }

  /** One micro-batch of the screening loop: verdicts overwrite their
    * own `batch=<id>` partition dir (replay = replace, not append).
    */
  def processBatch(batch: DataFrame, benchDir: String,
      verdictsDir: String, batchId: Long): Unit = {
    val bench = batch.sparkSession.read.parquet(benchDir)
    screenBatch(batch, bench).write.mode("overwrite")
      .parquet(s"$verdictsDir/batch=$batchId")
  }

  /** Start the streaming screen. `docs` is a streaming DataFrame of
    * (doc_id LONG, text STRING).
    */
  def screenStream(
      docs: DataFrame, benchDir: String, verdictsDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, benchDir, verdictsDir, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming model inference — the batch-train / stream-score shape:
  * a quality model trained ONCE on the curated corpus
  * ([[graft.operators.Select.nbArtifacts]]) scores documents as they
  * arrive. The live counterpart of the batch `classify_nb` query,
  * exactly as [[DocStream]] is the live counterpart of
  * `dedup_incremental`.
  *
  * Architecture: the model is data, not state — the token-LLR table
  * and the one-row constants frame are ordinary DataFrames (from the
  * training session or re-read from storage), joined into each
  * micro-batch inside foreachBatch. No state store: scoring is
  * deterministic per document, and each batch OVERWRITES its own
  * `batch=<id>` partition directory — a replayed batch replaces its
  * previous (possibly partial) output with byte-identical rows, so
  * the directory as a whole is exactly-once without any dedup burden
  * on consumers (a bare append would duplicate rows on replay).
  *
  * At scale the per-batch join carries (tok, llr9) pairs — the
  * vocabulary, not the corpus. A production vocabulary (1e6-1e8
  * tokens) either broadcasts (it is a few hundred MB of longs) or
  * falls back to a shuffled equi-join per batch; both are the same
  * one-line change here. OOV tokens cost nothing: their add-one
  * contribution is algebraically folded into the n_toks·corr9 term
  * (see nbArtifacts), so the stream never needs a vocabulary check.
  */
object ScoreStream {

  /** One micro-batch's write — overwrite of its own partition dir, so
    * calling it again with the same batchId (a replay) REPLACES the
    * previous output instead of duplicating it (idempotence is
    * spec-proven by invoking this twice).
    */
  def scoreBatch(batch: DataFrame, model: DataFrame, consts: DataFrame,
      outDir: String, batchId: Long): Unit =
    graft.operators.Select.nbScoreWith(batch, model, consts)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")

  /** Score a streaming (doc_id, text) frame against the trained
    * artifacts; margins land under `outDir/batch=<id>/` as
    * (doc_id, n_toks, nb_margin, nb_pred) — read the root with
    * partition discovery and the batch id comes along as a column.
    */
  def scoreStream(
      docs: DataFrame, model: DataFrame, consts: DataFrame,
      outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(batch, model, consts, outDir, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

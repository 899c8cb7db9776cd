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
  * deterministic per document, so a replayed batch rewrites byte-
  * identical rows and the output is idempotent at the row level
  * (consumers key by doc_id; at-least-once append, exactly-once
  * effect).
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

  /** Score a streaming (doc_id, text) frame against the trained
    * artifacts; margins append to `outDir` as
    * (doc_id, n_toks, nb_margin, nb_pred).
    */
  def scoreStream(
      docs: DataFrame, model: DataFrame, consts: DataFrame,
      outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Select.nbScoreWith(batch, model, consts)
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StructField, StructType}

/** Scala-side contract for the Python/Arrow NB scoring hook
  * (`python/graft_classify.py`) — the "swap in a real model" seam of
  * [[Select.nbClassify]] (D49), and the SECOND consumer of the Arrow
  * boundary pattern [[MultimodalArrow]] established, proving the
  * contract-object + parity-spec shape generalizes beyond multimodal
  * decode.
  *
  * Division of labor: the registered `classify_nb` scores with a
  * DISTRIBUTED join against the vocabulary-sized model table — right
  * when the model is corpus-derived. A production quality classifier
  * is the other shape: a trained MODEL ARTIFACT (fastText binary, a
  * distilled transformer) applied in-process per document. That
  * inference crosses the JVM→Python boundary via
  * `DataFrame.mapInArrow`; THIS object owns the contract both sides
  * must satisfy, the Python module owns the (swappable) scoring body.
  *
  * The contract, spec-enforced by ClassifyArrowSpec:
  *  - ARTIFACTS: [[writeArtifacts]] exports exactly the frames
  *    [[Select.nbArtifacts]] trains — `model.parquet` (tok, llr9) and
  *    `consts.parquet` (corr9, prior9) — the handoff a production
  *    pipeline ships to its scorer.
  *  - SCHEMA: exactly [[contractSchema]] (doc_id, n_toks, nb_margin,
  *    nb_pred) — the registered query's scoring columns (the training
  *    label join is the trainer's concern, not the scorer's).
  *  - VALUES: row-for-row, BIT-FOR-BIT equal to the registered
  *    `classify_nb` on the same table: the score is ln9big fixed-point
  *    integer arithmetic end-to-end with one final float64 /1e9, so
  *    parity is exact, not approximate (Python ints are exact;
  *    `text.split(" ")` matches Spark's limit=-1 split, empty tokens
  *    included).
  *  - BATCH SHAPE + MODEL PLACEMENT: pinned
  *    `arrow.maxRecordsPerBatch`, per-batch row counts as evidence,
  *    and the model loaded ONCE PER PARTITION before the batch loop
  *    (the codec-init placement of the multimodal hook).
  *
  * Scale note: the in-process model dict is O(model file), not
  * O(corpus) — the seam's whole point; the distributed-join scorer
  * stays the registered default for corpus-derived vocabularies.
  * Deployment swaps ONLY `load_model`/`score_tokens` in the Python
  * module; everything asserted here is model-independent.
  */
object ClassifyArrow {

  /** Repo-relative path of the Python module (resolved against the
    * working directory by the spec; shipped with the library so a
    * deployment's `spark-submit --py-files` can pick it up verbatim).
    */
  val scriptPath = "python/graft_classify.py"

  /** The exact output schema both the registered query's scoring
    * columns and the Arrow path must produce.
    */
  val contractSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_toks", LongType),
    StructField("nb_margin", DoubleType),
    StructField("nb_pred", BooleanType)))

  /** Export the NB model artifacts for `sfDir`'s corpus — the literal
    * [[Select.nbArtifacts]] frames the registered query trains, so the
    * exported model and the distributed scorer cannot drift.
    */
  def writeArtifacts(s: SparkSession, sfDir: String, dir: String): Unit = {
    val (model, consts) = Select.nbArtifacts(s, sfDir)
    model.write.mode("overwrite").parquet(s"$dir/model.parquet")
    consts.write.mode("overwrite").parquet(s"$dir/consts.parquet")
  }

  /** Rows produced by exactly one of (Arrow-path output at
    * `scoredDir`, registered `classify_nb`'s scoring columns over
    * `sfDir`) — (arrowOnly, scalaOnly). Both empty ⇔ bit-exact
    * parity, the float margin included. Multiset semantics
    * (`exceptAll`), so duplicated rows can't hide a count mismatch.
    */
  def parityDiff(s: SparkSession, scoredDir: String,
      sfDir: String): (DataFrame, DataFrame) = {
    val cols = contractSchema.fieldNames.map(col)
    val arrow = s.read.schema(contractSchema).parquet(scoredDir)
      .select(cols: _*)
    val scalaSide = Select.nbClassify.fn(s, sfDir).select(cols: _*)
    (arrow.exceptAll(scalaSide), scalaSide.exceptAll(arrow))
  }
}

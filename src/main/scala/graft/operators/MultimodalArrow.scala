package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.types.StructType

/** Scala-side contract for the Python/Arrow multimodal decode path
  * (`python/graft_multimodal.py`) — the production twin of
  * [[Multimodal.meta]]'s mapPartitions stub.
  *
  * Division of labor: a real multimodal pipeline decodes payloads
  * with Python-side codecs (PIL/ffmpeg), so the decode step crosses
  * the JVM→Python boundary via `DataFrame.mapInArrow`. THIS object
  * owns the contract both sides must satisfy; the Python module owns
  * the (swappable) decode body. The reference's analogous capability
  * class is arbitrary-runtime enrichment inside the pipeline
  * (flink-tank EventProcessorJob.kt:99-128 does it host-language-side
  * in Kotlin; on Spark the idiomatic boundary is Arrow).
  *
  * The contract, spec-enforced by MultimodalArrowSpec:
  *  - SCHEMA: exactly [[FrameFeature]] (doc_id, mime, n_bytes,
  *    frame_id, frame_bytes, resized_bytes, f0..f3 float32) — the
  *    same flattened shape the oracle pins for `multimodal_meta`.
  *  - VALUES: row-for-row, bit-for-bit equal to the Scala stub query
  *    on the same table, float lanes included (the Python fake mirrors
  *    `decodeStub`'s exact-int-sum → float32 division).
  *  - BATCH SHAPE: the Python side runs under a pinned
  *    `spark.sql.execution.arrow.maxRecordsPerBatch` and emits
  *    per-batch row counts as evidence; the spec asserts the runtime
  *    actually chunked (no monolithic batch) and no batch exceeded
  *    the pin.
  *  - PARTITIONING: payloads cross one round-robin exchange
  *    PRE-decode (balancing codec work), then stay narrow — scan →
  *    mapInArrow → columnar write, payload bytes never shuffle
  *    post-fan-out. Same scale shape as the Scala stub path.
  *
  * Deployment swaps ONLY `fake_decode` in the Python module for a
  * real codec; everything asserted here is codec-independent.
  */
object MultimodalArrow {

  /** Repo-relative path of the Python module (resolved against the
    * working directory by the spec; shipped with the library so a
    * deployment's `spark-submit --py-files` can pick it up verbatim).
    */
  val scriptPath = "python/graft_multimodal.py"

  /** The exact output schema both the Scala stub and the Arrow path
    * must produce.
    */
  val contractSchema: StructType = Encoders.product[FrameFeature].schema

  /** Rows produced by exactly one of (Arrow-path output at
    * `framesDir`, Scala stub query over `sfDir`) — (arrowOnly,
    * scalaOnly). Both empty ⇔ bit-exact parity, float lanes included.
    * Multiset semantics (`exceptAll`), so duplicated rows can't hide
    * a count mismatch.
    */
  def parityDiff(s: SparkSession, framesDir: String, sfDir: String): (DataFrame, DataFrame) = {
    val cols = contractSchema.fieldNames.map(org.apache.spark.sql.functions.col)
    val arrow = s.read.schema(contractSchema).parquet(framesDir).select(cols: _*)
    val scalaSide = Multimodal.meta.fn(s, sfDir).select(cols: _*)
    (arrow.exceptAll(scalaSide), scalaSide.exceptAll(arrow))
  }
}

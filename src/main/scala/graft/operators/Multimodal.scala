package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One decoded "frame" feature row (the unit a downstream trainer
  * consumes). The FeatDim feature vector is flattened to scalar
  * columns `f0..f3`: external checkers (the driver's pandas-based
  * rows-only compare) sort on every column, and an `array<float>`
  * cell is not a sortable key there. A real pipeline wanting the
  * vector form can `array(f0..f3)` it back in one projection.
  */
final case class FrameFeature(
    doc_id: Long,
    mime: String,
    n_bytes: Long,
    frame_id: Int,
    frame_bytes: Long,
    resized_bytes: Long,
    f0: Float,
    f1: Float,
    f2: Float,
    f3: Float)

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, batched decode / feature-extract / frame-sample.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`decodeStub`) — the Spark-side
  * contract is the real deliverable: schema (binary + metadata
  * struct), per-partition batched processing via `mapPartitions`
  * (the Scala analog of Python's `mapInPandas` — one iterator per
  * partition, so a real codec would amortize model/codec init across
  * the partition), frame-sampling fan-out, and a fixed-width float
  * feature vector per frame.
  *
  * Scale: payloads never shuffle — the pipeline is scan -> narrow
  * mapPartitions -> (optional) columnar feature write. Partition
  * sizing is governed by `spark.sql.files.maxPartitionBytes` against
  * the binary column width; metadata-only queries prune the binary
  * column entirely.
  */
object Multimodal {

  private val FrameSize = 256 // bytes per sampled frame
  private val FeatDim = 4

  /** STUB decode: a real implementation would decode the frame with a
    * codec (JPEG/PNG/PCM/...) and run feature extraction. This fake
    * derives a deterministic FeatDim-vector from the raw bytes so the
    * plumbing is testable end-to-end.
    */
  private def decodeStub(frame: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](FeatDim)
    var i = 0
    while (i < frame.length) {
      acc(i % FeatDim) += (frame(i) & 0xff).toLong
      i += 1
    }
    acc.map(v => if (frame.isEmpty) 0f else v.toFloat / frame.length)
  }

  /** documents.text reinterpreted as an opaque binary payload with
    * typed metadata — the stand-in for (image_bytes, exif) columns.
    */
  val meta = QueryDef(
    "multimodal_meta",
    (s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).select(
        col("doc_id"),
        col("text").cast(BinaryType).as("media"),
        concat(lit("application/x-graft-"), col("source")).as("mime"))
      media.as[(Long, Array[Byte], String)]
        .mapPartitions { rows =>
          // Batched per-partition processing: codec init would live
          // here, once per partition, not per row.
          rows.flatMap { case (docId, bytes, mime) =>
            val nFrames = (bytes.length + FrameSize - 1) / FrameSize
            // Frame-sample: every other frame (stride 2), mirroring
            // video keyframe sampling.
            (0 until nFrames by 2).map { f =>
              val frame = bytes.slice(f * FrameSize, math.min((f + 1) * FrameSize, bytes.length))
              // Resize STUB: stride-4 byte downsample stands in for a
              // real image/audio resample before feature extraction.
              val resized = frame.indices.collect { case i if i % 4 == 0 => frame(i) }.toArray
              val feat = decodeStub(resized)
              FrameFeature(docId, mime, bytes.length.toLong, f, frame.length.toLong,
                resized.length.toLong, feat(0), feat(1), feat(2), feat(3))
            }
          }
        }
        .toDF()
    },
    // No SQL oracle: the mapPartitions decode path is deliberately not
    // SQL-expressible (driver records the rows-only check).
    None)

  val defs: Seq[QueryDef] = Seq(meta)
}

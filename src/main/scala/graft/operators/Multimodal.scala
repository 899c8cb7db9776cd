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

  /** DuckDB mirror of the frame-sample → resize → decode-stub chain —
    * CTEs ending at `ff(doc_id, mime, n_bytes, frame_id, frame_bytes,
    * rb, fs)` where `fs` is the FeatDim float32 feature vector.
    * Shared by the `multimodal_meta` and `multimodal_near_dup`
    * oracles (one derivation, two tails).
    *
    * What this verifies cross-engine is the PLUMBING arithmetic the
    * mapPartitions path implements — frame boundaries, the stride-2
    * sample, the stride-4 resize, per-lane sums, and the float32
    * division — not a real codec (the stub stands in for that by
    * design). The payload here is the ASCII text column cast to
    * binary, so `ascii()` code points equal bytes; a non-ASCII
    * payload makes the oracle RAISE (strlen != length) rather than
    * silently diverge from the byte-level Scala path.
    */
  private def stubFeatureCtesSql: String =
    s"""frames AS (
      SELECT doc_id, 'application/x-graft-' || source AS mime,
        CAST(strlen(text) AS BIGINT) AS n_bytes, f.f AS frame_id,
        CASE WHEN strlen(text) <> length(text)
          THEN error('multimodal oracle: non-ASCII payload — code-point decode would diverge from the byte-level stub')
          ELSE list_transform(range(f.f * $FrameSize + 1, LEAST((f.f + 1) * $FrameSize, length(text)) + 1),
            i -> ascii(substr(text, CAST(i AS INT), 1))) END AS fb
      FROM documents,
        LATERAL (SELECT unnest(range(0, CAST(ceil(length(text) / $FrameSize.0) AS BIGINT), 2)) AS f) f),
    feats AS (
      SELECT doc_id, mime, n_bytes, frame_id,
        CAST(len(fb) AS BIGINT) AS frame_bytes,
        list_filter(list_transform(fb, (x, i) -> CASE WHEN (i - 1) % 4 = 0 THEN x END), x -> x IS NOT NULL) AS rb
      FROM frames),
    ff AS (
      SELECT doc_id, mime, n_bytes, frame_id, frame_bytes,
        CAST(len(rb) AS BIGINT) AS resized_bytes,
        [CAST(CAST(COALESCE(list_sum(list_filter(list_transform(rb, (x, i) -> CASE WHEN (i - 1) % $FeatDim = j THEN x END), x -> x IS NOT NULL)), 0) AS FLOAT) / len(rb) AS FLOAT) FOR j IN [0, 1, 2, 3]] AS fs
      FROM feats)"""

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
            sampledFrames(bytes).map { case (f, frameLen, resizedLen, feat) =>
              FrameFeature(docId, mime, bytes.length.toLong, f, frameLen.toLong,
                resizedLen.toLong, feat(0), feat(1), feat(2), feat(3))
            }
          }
        }
        .toDF()
    },
    // Oracle-hash-checked since r8 (formerly rows-only): the stub
    // arithmetic is re-derived in SQL (see stubFeatureCtesSql) — the
    // mapPartitions batching remains the Spark-side deliverable; the
    // oracle pins its frame/stride/resize/float32 arithmetic
    // cross-engine, bit-exact including the f0..f3 float lanes.
    Some(s"""WITH $stubFeatureCtesSql
      SELECT doc_id, mime, n_bytes, CAST(frame_id AS INT) AS frame_id,
        frame_bytes, resized_bytes,
        fs[1] AS f0, fs[2] AS f1, fs[3] AS f2, fs[4] AS f3
      FROM ff ORDER BY doc_id, frame_id"""))

  /** Exact dedup of the BINARY media payloads by content hash — the
    * first pass every multimodal ingestion runs (identical images/
    * clips re-crawled under different ids), reported per mime type:
    * asset count, unique count, and bytes before/after dedup. Unlike
    * the decode path this is pure SQL surface (md5 over the binary
    * column), so it IS oracle-checked — the multimodal family's
    * fully-verified member.
    *
    * Scale: one partial+final aggregate whose exchange carries one row
    * per DISTINCT payload hash (never the payloads — md5 happens at
    * the scan), then a tiny per-mime rollup.
    */
  val dedupMedia = QueryDef(
    "multimodal_dedup",
    (s, d) => {
      Tables.documents(s, d)
        .select(concat(lit("application/x-graft-"), col("source")).as("mime"),
          md5(col("text").cast(BinaryType)).as("h"),
          expr("octet_length(text)").cast(LongType).as("nb"))
        .groupBy("mime", "h", "nb")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("mime")
        .agg(sum(col("cnt")).as("n_assets"),
          count(lit(1)).as("n_unique"),
          sum(col("cnt") * col("nb")).as("bytes_total"),
          sum(col("nb")).as("bytes_unique"))
    },
    Some("""WITH h AS (
      SELECT 'application/x-graft-' || source AS mime, md5(text) AS h,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nb,
             COUNT(*) AS cnt
      FROM documents GROUP BY 1, 2, 3)
    SELECT mime, CAST(SUM(cnt) AS BIGINT) AS n_assets,
           COUNT(*) AS n_unique,
           CAST(SUM(cnt * nb) AS BIGINT) AS bytes_total,
           CAST(SUM(nb) AS BIGINT) AS bytes_unique
    FROM h GROUP BY mime ORDER BY mime"""))

  private val PHashGrid = 1000f

  /** Doc-level perceptual feature via the decode stub: the sampled
    * frames' features averaged, then floor-quantized onto a coarse
    * grid — the pHash shape (small perturbations of the payload land
    * in the same bucket; byte-exactness not required).
    */
  /** Stride-2 frame sample -> stride-4 resize stub -> decode stub:
    * THE frame pipeline, shared by [[meta]]'s mapPartitions body and
    * [[pHashOf]] — both must stay bit-identical to the one SQL
    * derivation (stubFeatureCtesSql) their oracles use, and a stride
    * edit applied to one Scala copy but not the other would
    * desynchronize multimodal_near_dup from multimodal_meta. Yields
    * (frame_id, frame_len, resized_len, features) in frame order.
    */
  private def sampledFrames(bytes: Array[Byte]): Seq[(Int, Int, Int, Array[Float])] = {
    val nFrames = (bytes.length + FrameSize - 1) / FrameSize
    (0 until nFrames by 2).map { f =>
      val frame = bytes.slice(f * FrameSize, math.min((f + 1) * FrameSize, bytes.length))
      val resized = frame.indices.collect { case i if i % 4 == 0 => frame(i) }.toArray
      (f, frame.length, resized.length, decodeStub(resized))
    }
  }

  private[graft] def pHashOf(bytes: Array[Byte]): String = {
    val acc = new Array[Double](FeatDim)
    var used = 0
    sampledFrames(bytes).foreach { case (_, _, _, feat) =>
      var j = 0
      while (j < FeatDim) { acc(j) += feat(j); j += 1 }
      used += 1
    }
    val avg = if (used == 0) acc else acc.map(_ / used)
    avg.map(v => math.floor(v * PHashGrid).toLong).mkString(":")
  }

  /** Perceptual NEAR-dup of binary media — the second pass after
    * [[dedupMedia]]'s byte-exact hash: payloads whose decoded
    * doc-level features quantize to the same coarse bucket collapse
    * to one canonical asset even when their bytes differ (re-encoded
    * or lightly corrupted copies — spec proves a payload with a
    * flipped trailing byte still groups with its original, and that
    * every byte-exact dup group is subsumed). Real pipelines put a
    * real pHash/embedding behind the same contract; the stub keeps
    * the Spark-side plumbing — batched per-partition decode, hash
    * grouping, min-id survivor — genuine and tested.
    *
    * Scale: payloads never shuffle (the per-partition map reduces
    * each to a short hash string); the grouping exchange carries
    * (doc_id, phash) pairs only. Oracle-hash-checked since r8 (shares
    * [[stubFeatureCtesSql]]; the frame-feature average folds in
    * frame_id order through a list_reduce so the double accumulation
    * matches the Scala loop's order exactly); NearDupMediaSpec
    * remains the perceptual-contract gate (perturbation stability,
    * exact-dup subsumption).
    */
  val nearDupMedia = QueryDef(
    "multimodal_near_dup",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast(BinaryType).as("media"),
          concat(lit("application/x-graft-"), col("source")).as("mime"))
        .as[(Long, Array[Byte], String)]
        .mapPartitions { rows =>
          rows.map { case (docId, bytes, mime) => (docId, mime, pHashOf(bytes)) }
        }
        .toDF("doc_id", "mime", "phash")
      val w = Window.partitionBy("mime", "phash")
      hashed
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .withColumn("group_size", count(lit(1)).over(w))
        .select(col("doc_id"), col("mime"), col("phash"),
          col("canonical_id"), (col("doc_id") === col("canonical_id")).as("keep"),
          col("group_size"))
    },
    Some(s"""WITH $stubFeatureCtesSql,
      docacc AS (
        SELECT doc_id, mime,
          [list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(l, x -> CAST(x[j] AS DOUBLE))), (a, b) -> a + b) / len(l) FOR j IN [1, 2, 3, 4]] AS avg4
        FROM (SELECT doc_id, mime, list(fs ORDER BY frame_id) AS l FROM ff GROUP BY doc_id, mime)),
      ph AS (
        SELECT d.doc_id, 'application/x-graft-' || d.source AS mime,
          COALESCE(a.ph, '0:0:0:0') AS phash
        FROM documents d LEFT JOIN (
          SELECT doc_id, mime,
            list_aggregate(list_transform(avg4, v -> CAST(CAST(floor(v * 1000.0) AS BIGINT) AS VARCHAR)), 'string_agg', ':') AS ph
          FROM docacc) a ON a.doc_id = d.doc_id)
      SELECT doc_id, mime, phash,
        MIN(doc_id) OVER (PARTITION BY mime, phash) AS canonical_id,
        doc_id = MIN(doc_id) OVER (PARTITION BY mime, phash) AS keep,
        COUNT(*) OVER (PARTITION BY mime, phash) AS group_size
      FROM ph ORDER BY doc_id"""))

  val defs: Seq[QueryDef] = Seq(meta, dedupMedia, nearDupMedia)
}

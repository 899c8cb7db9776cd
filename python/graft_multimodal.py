#!/usr/bin/env python3
"""Python/Arrow multimodal decode path — the production twin of the
Scala `multimodal_meta` stub (graft.operators.Multimodal, D12).

Why this file exists: a real multimodal pipeline decodes image/audio
payloads with Python-side codecs (PIL/ffmpeg/torchaudio), which means
the decode step crosses the JVM->Python boundary through Spark's Arrow
batch protocol (`DataFrame.mapInArrow`). The Scala library carries the
oracle-pinned CONTRACT (schema, stride arithmetic, batched
per-partition processing via mapPartitions); this module is the same
contract expressed on the Arrow path, so a deployment can swap
`fake_decode` for a real codec without touching schema, partitioning,
or batch shape. The reference's analogous capability class is
arbitrary-runtime enrichment inside the pipeline
(flink-tank EventProcessorJob.kt:99-128, Kotlin-side).

Parity rule (spec-enforced by graft.MultimodalArrowSpec): the output
of `frame_features` must be ROW-FOR-ROW, BIT-FOR-BIT equal to the
Scala `multimodal_meta` query on the same table — including the
float32 feature lanes. That pins:
  - frame boundaries:  ceil(n_bytes / FRAME_SIZE) frames of FRAME_SIZE
  - stride-2 frame SAMPLE (frame ids 0, 2, 4, ...)
  - stride-4 RESIZE within a frame (bytes 0, 4, 8, ...)
  - per-lane byte sums (lane j sums resized[j::FEAT_DIM], exact ints)
  - float32(lane_sum) / float32(len(resized)) — IEEE-754 binary32
    division, identical to Scala's `Long.toFloat / Int`.

The decode itself is the SAME deterministic fake as the Scala stub —
clearly marked below — because this container ships no codecs; a real
deployment replaces ONLY `fake_decode`.

Usage:  python3 python/graft_multimodal.py <sf_dir> <out_dir>
Writes: <out_dir>/frames.parquet     — the mapInArrow result
        <out_dir>/batch_stats.json   — Arrow batch-shape evidence
"""

import json
import os
import sys

import numpy as np
import pyarrow as pa

FRAME_SIZE = 256  # bytes per sampled frame (== Multimodal.FrameSize)
FEAT_DIM = 4      # feature lanes per frame (== Multimodal.FeatDim)

# The spec asserts real chunking happened, so pin the Arrow batch size
# well under sf0.01's row count instead of the 10k default.
MAX_RECORDS_PER_BATCH = 64

OUT_SCHEMA_DDL = (
    "doc_id long, mime string, n_bytes long, frame_id int, "
    "frame_bytes long, resized_bytes long, "
    "f0 float, f1 float, f2 float, f3 float"
)

OUT_SCHEMA_ARROW = pa.schema([
    ("doc_id", pa.int64()),
    ("mime", pa.string()),
    ("n_bytes", pa.int64()),
    ("frame_id", pa.int32()),
    ("frame_bytes", pa.int64()),
    ("resized_bytes", pa.int64()),
    ("f0", pa.float32()),
    ("f1", pa.float32()),
    ("f2", pa.float32()),
    ("f3", pa.float32()),
])


def fake_decode(resized):
    """DETERMINISTIC FAKE of the codec+featurizer step — byte-identical
    to the Scala stub (Multimodal.decodeStub): lane j is the exact
    integer sum of resized[j::FEAT_DIM], divided in float32 by the
    resized length. A real deployment replaces THIS function only
    (e.g. PIL decode + model features); everything around it — Arrow
    batching, schema, frame arithmetic — is the shipping contract.
    """
    n = len(resized)
    if n == 0:
        return [np.float32(0)] * FEAT_DIM
    return [
        np.float32(int(resized[j::FEAT_DIM].sum(dtype=np.int64)))
        / np.float32(n)
        for j in range(FEAT_DIM)
    ]


def _decode_rows(doc_id, media, mime):
    """Frame-sample one payload: yields one output row per SAMPLED
    frame (stride 2), mirroring Multimodal.sampledFrames exactly.
    """
    buf = np.frombuffer(media, dtype=np.uint8)
    n_bytes = len(buf)
    n_frames = (n_bytes + FRAME_SIZE - 1) // FRAME_SIZE
    for f in range(0, n_frames, 2):
        frame = buf[f * FRAME_SIZE:min((f + 1) * FRAME_SIZE, n_bytes)]
        resized = frame[::4]
        feats = fake_decode(resized)
        yield (doc_id, mime, n_bytes, f, len(frame), len(resized), feats)


def frame_feature_batches(batches):
    """mapInArrow body: RecordBatch iterator in, RecordBatch iterator
    out. One output batch per input batch (the decode fan-out is small
    — <=1 sampled frame per 512 payload bytes — so output batches stay
    the same order of magnitude as input ones; a high-fan-out decoder
    would re-chunk here). Codec/model init for a real decoder belongs
    HERE, before the loop — once per partition, not per row, exactly
    like the Scala mapPartitions analog.
    """
    for batch in batches:
        doc_ids = batch.column("doc_id")
        medias = batch.column("media")
        mimes = batch.column("mime")
        out = {name: [] for name in OUT_SCHEMA_ARROW.names}
        for i in range(batch.num_rows):
            rows = _decode_rows(doc_ids[i].as_py(), medias[i].as_py(),
                                mimes[i].as_py())
            for (d, m, nb, fid, fb, rb, feats) in rows:
                out["doc_id"].append(d)
                out["mime"].append(m)
                out["n_bytes"].append(nb)
                out["frame_id"].append(fid)
                out["frame_bytes"].append(fb)
                out["resized_bytes"].append(rb)
                for j in range(FEAT_DIM):
                    out["f%d" % j].append(feats[j])
        yield pa.RecordBatch.from_arrays(
            [pa.array(out[f.name], type=f.type) for f in OUT_SCHEMA_ARROW],
            schema=OUT_SCHEMA_ARROW)


def batch_stat_batches(batches):
    """Second mapInArrow pass used only for batch-shape EVIDENCE: one
    output row per arriving Arrow batch carrying its row count, so the
    Scala spec can assert the runtime actually chunked per
    maxRecordsPerBatch instead of shipping one monolithic batch.
    """
    schema = pa.schema([("batch_rows", pa.int64())])
    for batch in batches:
        yield pa.RecordBatch.from_arrays(
            [pa.array([batch.num_rows], type=pa.int64())], schema=schema)


def media_frame(spark, sf_dir):
    """The same projection the Scala query builds: (doc_id, media
    binary, mime) — text reinterpreted as an opaque payload, mime
    derived from source. Metadata-only consumers prune `media` at the
    parquet scan; the payload never shuffles (scan -> narrow
    mapInArrow -> columnar write).
    """
    from pyspark.sql import functions as F
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("binary").alias("media"),
        F.concat(F.lit("application/x-graft-"), F.col("source")).alias("mime"),
    )


def main(sf_dir, out_dir):
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder
        .master("local[4]")
        .appName("graft-multimodal-arrow")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(MAX_RECORDS_PER_BATCH))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    try:
        # 4 partitions so the spec exercises multi-partition batching;
        # a round-robin repartition of the narrow projection, NOT the
        # decoded fan-out (payloads cross the exchange once, pre-decode
        # — same placement a real cluster would pick to balance codec
        # work).
        media = media_frame(spark, sf_dir).repartition(4)
        n_input = media.count()
        n_parts = media.rdd.getNumPartitions()

        decoded = media.mapInArrow(frame_feature_batches, OUT_SCHEMA_DDL)
        decoded.write.mode("overwrite").parquet(
            os.path.join(out_dir, "frames.parquet"))

        batch_rows = [
            r["batch_rows"]
            for r in media.mapInArrow(batch_stat_batches, "batch_rows long")
                          .collect()
        ]
        stats = {
            "input_rows": n_input,
            "partitions": n_parts,
            "max_records_per_batch": MAX_RECORDS_PER_BATCH,
            "batch_rows": sorted(batch_rows),
        }
        with open(os.path.join(out_dir, "batch_stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
        print("[graft-arrow] wrote %d input rows as %d batches over %d "
              "partitions" % (n_input, len(batch_rows), n_parts))
    finally:
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: graft_multimodal.py <sf_dir> <out_dir>")
    os.makedirs(sys.argv[2], exist_ok=True)
    main(sys.argv[1], sys.argv[2])

#!/usr/bin/env python3
"""Python/Arrow scoring hook for the NB quality classifier — the
"swap in a real model" seam of `classify_nb` (graft.operators.Select,
D49), and the second consumer of the Arrow boundary pattern
`python/graft_multimodal.py` established (proving the contract-object
+ parity-spec pattern generalizes beyond multimodal decode).

Why this file exists: the registered `classify_nb` scores documents
with a DISTRIBUTED join against the vocabulary-sized model table —
the right shape when the model is corpus-derived and vocabulary-sized.
A production quality classifier is usually the other shape: a trained
MODEL ARTIFACT (fastText binary, a distilled transformer) applied
in-process per document, loaded once per partition. That inference
step crosses the JVM->Python boundary through `DataFrame.mapInArrow`;
this module owns the (swappable) scoring body, while
`graft.operators.ClassifyArrow` owns the contract both sides satisfy
(artifact schema, output schema, batch shape, model-load-once
placement).

Parity rule (spec-enforced by graft.ClassifyArrowSpec): scoring the
corpus through this hook with the EXPORTED NB artifacts must be
ROW-FOR-ROW, BIT-FOR-BIT equal to the registered `classify_nb`'s
scoring columns (doc_id, n_toks, nb_margin, nb_pred). That holds
exactly, not approximately, because the score is integer arithmetic
end-to-end (the ln9big fixed-point family) with ONE final float64
division by 1e9 — Python ints are exact, and float64(score9)/1e9 is
the same IEEE-754 operation Spark's `cast(DoubleType)/1e9` performs.

Token parity detail: Spark's `split(text, " ")` keeps interior AND
trailing empty strings (limit = -1), which is exactly Python's
`text.split(" ")` — both count them in n_toks and look them up in the
model like any token.

A real deployment replaces ONLY `load_model` + `score_tokens` (e.g.
load a fastText binary, return its logit); everything around them —
Arrow batching, the artifact handoff, the per-partition model load,
the output schema — is the shipping contract.

Usage:  python3 python/graft_classify.py <sf_dir> <artifacts_dir> <out_dir>
Writes: <out_dir>/scored.parquet     — the mapInArrow result
        <out_dir>/batch_stats.json   — Arrow batch-shape evidence
"""

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# The spec asserts real chunking happened, so pin the Arrow batch size
# well under sf0.01's row count instead of the 10k default.
MAX_RECORDS_PER_BATCH = 64

OUT_SCHEMA_DDL = (
    "doc_id long, n_toks long, nb_margin double, nb_pred boolean"
)

OUT_SCHEMA_ARROW = pa.schema([
    ("doc_id", pa.int64()),
    ("n_toks", pa.int64()),
    ("nb_margin", pa.float64()),
    ("nb_pred", pa.bool_()),
])


def load_model(artifacts_dir):
    """Load the exported NB artifacts into the in-process form the
    scorer applies — the fastText-model-file analog. Called ONCE PER
    PARTITION (inside the mapInArrow generator, before the batch
    loop), never per row or per batch: model size is O(model), not
    O(corpus), which is the whole point of the artifact seam. A real
    deployment replaces this with its codec/model load (and
    `score_tokens` below with its forward pass).
    """
    model = pq.read_table(os.path.join(artifacts_dir, "model.parquet"))
    llr = dict(zip(model.column("tok").to_pylist(),
                   model.column("llr9").to_pylist()))
    consts = pq.read_table(os.path.join(artifacts_dir, "consts.parquet"))
    corr9 = consts.column("corr9")[0].as_py()
    prior9 = consts.column("prior9")[0].as_py()
    return llr, corr9, prior9


def score_tokens(text, llr, corr9, prior9):
    """THE SWAPPABLE SCORING BODY — here the exact NB margin the Scala
    side computes (integer sum of per-token log-likelihood ratios, OOV
    riding the corr9 term), so parity is bit-exact. Python ints are
    arbitrary precision: no overflow path exists.
    """
    toks = text.split(" ")
    s9 = 0
    for t in toks:
        s9 += llr.get(t, 0)
    score9 = s9 + len(toks) * corr9 + prior9
    return len(toks), float(score9) / 1e9, score9 > 0


def make_score_batches(artifacts_dir):
    """Bind the artifact location into the mapInArrow body (executors
    resolve it themselves — the model never rides the closure).
    """
    def score_batches(batches):
        llr, corr9, prior9 = None, None, None
        for batch in batches:
            if llr is None:  # once per partition, before any scoring
                llr, corr9, prior9 = load_model(artifacts_dir)
            doc_ids = batch.column("doc_id")
            texts = batch.column("text")
            out = {name: [] for name in OUT_SCHEMA_ARROW.names}
            for i in range(batch.num_rows):
                text = texts[i].as_py()
                if text is None:
                    # parity with the distributed scorer: Spark's
                    # split(NULL) yields NULL, the token explode drops
                    # it, and the doc never reaches the score output -
                    # skip rather than crash the Arrow job (r13 review)
                    continue
                n_toks, margin, pred = score_tokens(
                    text, llr, corr9, prior9)
                out["doc_id"].append(doc_ids[i].as_py())
                out["n_toks"].append(n_toks)
                out["nb_margin"].append(margin)
                out["nb_pred"].append(pred)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out[f.name], type=f.type) for f in OUT_SCHEMA_ARROW],
                schema=OUT_SCHEMA_ARROW)
    return score_batches


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


def doc_frame(spark, sf_dir):
    """The scorer's input projection: (doc_id, text) — the same two
    columns the registered query's scoring half reads; everything else
    prunes at the parquet scan.
    """
    from pyspark.sql import functions as F
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
    )


def main(sf_dir, artifacts_dir, out_dir):
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder
        .master("local[4]")
        .appName("graft-classify-arrow")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(MAX_RECORDS_PER_BATCH))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    try:
        # 4 partitions so the spec exercises multi-partition batching
        # AND the once-per-partition model load; the narrow projection
        # crosses the exchange once, pre-scoring — the placement that
        # balances inference work on a real cluster.
        docs = doc_frame(spark, sf_dir).repartition(4)
        n_input = docs.count()
        n_parts = docs.rdd.getNumPartitions()

        scored = docs.mapInArrow(
            make_score_batches(artifacts_dir), OUT_SCHEMA_DDL)
        scored.write.mode("overwrite").parquet(
            os.path.join(out_dir, "scored.parquet"))

        batch_rows = [
            r["batch_rows"]
            for r in docs.mapInArrow(batch_stat_batches, "batch_rows long")
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
        print("[graft-arrow] scored %d docs as %d batches over %d "
              "partitions" % (n_input, len(batch_rows), n_parts))
    finally:
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit("usage: graft_classify.py <sf_dir> <artifacts_dir> <out_dir>")
    os.makedirs(sys.argv[3], exist_ok=True)
    main(sys.argv[1], sys.argv[2], sys.argv[3])

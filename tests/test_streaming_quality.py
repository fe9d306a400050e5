"""Streaming trained-classifier scoring: frozen-weight scores and
gate decisions on a multi-batch replay equal the batch serving
column, under any micro-batching (round-9 verdict item 7)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.curation import trained_score_col
from opc_ua_data_pipeline_spark.streaming.quality import (
    frozen_classifier_weights,
    quality_gate_stream,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _replay_dir(spark, rows, schema, d, chunks=3):
    d.mkdir()
    n = max(1, len(rows) // chunks)
    for i in range(chunks):
        chunk = rows[i * n :] if i == chunks - 1 else rows[i * n : (i + 1) * n]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(d / f"c{i}")
            )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))


def _run(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_scores_equal_batch(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    w = frozen_classifier_weights(docs)
    rows = docs.select("doc_id", "text").orderBy("doc_id").collect()
    schema = docs.select("doc_id", "text").schema
    d = tmp_path / "docs"
    _replay_dir(spark, rows, schema, d)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    got = {
        r.doc_id: (r.quality_score, r.keep)
        for r in _run(spark, quality_gate_stream(stream, w), "qgate")
    }
    want = {
        r.doc_id: (r.s, r.s is not None and r.s >= 0.5)
        for r in docs.select(
            "doc_id", trained_score_col(w).alias("s")
        ).collect()
    }
    assert len(got) == len(want)
    # scores are the same literal-weight arithmetic -> bit-identical
    assert got == want
    assert any(k for _, (_, k) in got.items()) and not all(
        k for _, (_, k) in got.items()
    ), "gate should split the fixture corpus"

"""Streaming bloom decontamination (streaming/curation.py): the
stateless row-wise bitmap probe must reproduce the batch TABLE-join
operator row-for-row when the same documents are replayed as a
multi-batch file stream.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.training import (
    BENCHMARK_SOURCE,
    bloom_contamination,
)
from opc_ua_data_pipeline_spark.streaming.curation import (
    bloom_bitmap_local,
    bloom_flag_stream,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stream_bloom_matches_batch(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("source") == BENCHMARK_SOURCE)
    corpus = docs.filter(F.col("source") != BENCHMARK_SOURCE)

    want = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["bloom_ratio"])
        for r in bloom_contamination(corpus, bench).collect()
    }

    bitmap = bloom_bitmap_local(bench)
    assert any(bitmap), "bitmap must have set bits"

    # Replay the corpus as a 2-file stream.
    rows = corpus.orderBy("doc_id").collect()
    d = tmp_path / "replay"
    d.mkdir()
    mid = len(rows) // 2
    for i, chunk in enumerate([rows[:mid], rows[mid:]]):
        spark.createDataFrame(chunk, corpus.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        bloom_flag_stream(stream, bitmap)
        .writeStream.format("memory")
        .queryName("bloomflags")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["bloom_ratio"])
        for r in spark.sql("SELECT * FROM bloomflags").collect()
    }
    assert got == want
    assert len(got) > 0
    # and the stream actually flags something on this corpus
    assert sum(v[1] for v in got.values()) > 0


def test_corpus_ingest_end_to_end_and_restart(spark, tmp_path):
    """start_corpus_ingest: the one-projection curation pipeline over
    a 2-file replay must (a) write exactly the rows the batch twin of
    the projection produces, and (b) write NOTHING new on a restart
    from the same checkpoint with no new input (exactly-once)."""
    from opc_ua_data_pipeline_spark.streaming.curation import (
        curate_projection,
        start_corpus_ingest,
    )

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("source") == BENCHMARK_SOURCE)
    corpus = docs.filter(F.col("source") != BENCHMARK_SOURCE)
    bitmap = bloom_bitmap_local(bench)

    want = sorted(
        (r["doc_id"], r["quality_score"], r["n_flagged"])
        for r in curate_projection(corpus, bitmap).collect()
    )
    assert len(want) > 0  # the filter keeps a nonempty curated set

    rows = corpus.orderBy("doc_id").collect()
    d = tmp_path / "in"
    d.mkdir()
    mid = len(rows) // 2
    for i, chunk in enumerate([rows[:mid], rows[mid:]]):
        spark.createDataFrame(chunk, corpus.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))

    out = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        q = start_corpus_ingest(stream, bitmap, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    got = sorted(
        (r["doc_id"], r["quality_score"], r["n_flagged"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == want

    # restart with no new files: exactly-once means no new rows
    run_once()
    again = sorted(
        (r["doc_id"], r["quality_score"], r["n_flagged"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == want


def test_streaming_calibration_matches_batch(spark, tmp_path):
    from opc_ua_data_pipeline_spark.operators.curation import (
        calibration_finalize,
        classifier_calibration,
    )
    from opc_ua_data_pipeline_spark.streaming.curation import (
        streaming_calibration_partials,
    )

    docs = load_table(spark, SF_DIR, "documents")
    want = {
        r["bin"]: (r["n_docs"], r["n_pos"], r["mean_score"], r["frac_pos"])
        for r in classifier_calibration(docs).collect()
    }

    rows = docs.orderBy("doc_id").collect()
    d = tmp_path / "replay_cal"
    d.mkdir()
    mid = len(rows) // 2
    for i, chunk in enumerate([rows[:mid], rows[mid:]]):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        streaming_calibration_partials(stream)
        .writeStream.format("memory")
        .queryName("cal_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["bin"]: (r["n_docs"], r["n_pos"], r["mean_score"], r["frac_pos"])
        for r in calibration_finalize(
            spark.table("cal_stream")
        ).collect()
    }
    assert got == want

"""Streaming dedup: re-deliveries dropped across micro-batches,
batch ≡ stream equivalence, and bounded state via the watermark."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.streaming.dedup import (
    content_dedup_stream,
    dedup_stream,
)
from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _order_files(d):
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))


def _run_stream(spark, df, name):
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
    return spark.sql(f"SELECT * FROM {name}")


def test_redeliveries_dropped_across_microbatches(spark, tmp_path):
    """Batch 2 replays every row of batch 1 (a crashed consumer's
    worst case) plus new rows; each event_id survives exactly once."""
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    half = len(rows) // 2
    d = tmp_path / "replay"
    d.mkdir()
    b1 = spark.createDataFrame(rows[:half], ev.schema)
    b2 = spark.createDataFrame(rows, ev.schema)  # full replay + new
    b1.coalesce(1).write.parquet(str(d / "b1"))
    b2.coalesce(1).write.parquet(str(d / "b2"))
    for i, f in enumerate(sorted(glob.glob(str(d / "b*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)

    out = _run_stream(
        spark, dedup_stream(file_stream(spark, str(d))), "dedup_replay"
    )
    got = out.groupBy("event_id").count().filter(F.col("count") > 1).count()
    assert got == 0
    assert out.count() == len(rows)
    # batch equivalence: same rows as batch dropDuplicates
    assert sorted(r.event_id for r in out.collect()) == sorted(
        r.event_id for r in ev.dropDuplicates(["event_id"]).collect()
    )


def test_content_dedup_stream(spark, tmp_path):
    """Documents with identical text collapse to the first arrival."""
    docs = [
        (1, "alpha beta", "2024-01-01 00:00:00"),
        (2, "alpha beta", "2024-01-01 00:01:00"),  # dup content
        (3, "gamma", "2024-01-01 00:02:00"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, ts_s string"
    ).select("doc_id", "text", F.to_timestamp("ts_s").alias("ts"))
    d = tmp_path / "docs"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "b"))
    for i, f in enumerate(sorted(glob.glob(str(d / "b" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = _run_stream(spark, content_dedup_stream(stream), "dedup_content")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 3]


def test_hash_gate_sampling_is_a_valid_stream_transform(spark, tmp_path):
    """The curation gates (sampling/splits) are stateless projections,
    so the same operator object runs unchanged on a stream and selects
    the identical row set — curation can happen at ingest time."""
    from opc_ua_data_pipeline_spark.operators.sampling import (
        SAMPLE_FRACTIONS,
        stratified_sample,
    )

    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay"
    d.mkdir()
    half = len(rows) // 2
    for i, chunk in enumerate([rows[:half], rows[half:]]):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)

    out = _run_stream(
        spark,
        stratified_sample(
            file_stream(spark, str(d)), "event_type", SAMPLE_FRACTIONS,
            "event_id",
        ),
        "stream_sampled",
    )
    got = sorted(r.event_id for r in out.collect())
    want = sorted(
        r.event_id
        for r in stratified_sample(
            ev, "event_type", SAMPLE_FRACTIONS, "event_id"
        ).collect()
    )
    assert got == want and len(got) > 0

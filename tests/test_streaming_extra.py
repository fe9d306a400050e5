"""Watermark late-data contract + streaming sessionization equivalence
(SURVEY.md §5.4: 'a late-event case dropped by the watermark exactly as
a bucket older than end_offset is excluded')."""

from __future__ import annotations

import glob
import os
import shutil


def _order_files(d):
    """Give replay files strictly increasing mtimes — the file stream
    source orders by modification time, and same-second writes tie."""
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

import pytest
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.functions.fixtures import opcua_fixture
from opc_ua_data_pipeline_spark.functions.simulator import generate_rows
from opc_ua_data_pipeline_spark.operators.rollups import machine_stats
from opc_ua_data_pipeline_spark.schemas import OPCUA_DATA_SCHEMA
from opc_ua_data_pipeline_spark.streaming.rollup import streaming_machine_stats
from opc_ua_data_pipeline_spark.streaming.sessionize import streaming_sessionize
from opc_ua_data_pipeline_spark.operators.relational import sessionize
from opc_ua_data_pipeline_spark.tables import load_table


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


def test_watermark_drops_late_row(spark, tmp_path):
    """The fixture's tick-3000 late row (event time 10 min in the past)
    arrives AFTER its minute bucket was emitted and evicted: the
    streaming rollup must exclude it while the batch rollup includes
    it.  (Spark's watermark is a one-directional guarantee — a late
    row merges into still-live state, which matches the reference CA
    policy's revision-within-start_offset; the guaranteed drop needs
    the state evicted first, hence the 3-file arrival order here.)"""
    rows = generate_rows(3600)
    late = [r for r in rows if r[1] == "ActualCycleTimeS" and r[2] == 0.99]
    assert len(late) == 1, "fixture late row present exactly once"
    late_row = late[0]
    late_bucket = late_row[0].replace(second=0, microsecond=0)

    n_before = len(generate_rows(3000))
    rest = [r for r in rows[n_before:] if r != late_row]
    parts = [
        rows[:n_before],      # advances the watermark past late_bucket
        rest[:200],           # eviction of the closed buckets happens here
        [late_row] + rest[200:],  # late row arrives after eviction
    ]
    df_schema = OPCUA_DATA_SCHEMA
    d = tmp_path / "replay"
    d.mkdir()
    for i, part in enumerate(parts):
        spark.createDataFrame(part, df_schema).coalesce(1).write.parquet(
            str(d / f"chunk{i}")
        )
    files = sorted(glob.glob(str(d / "chunk*" / "part-*.parquet")))
    for i, f in enumerate(files):
        shutil.move(f, str(d / f"{i:02d}.parquet"))
    for sub in glob.glob(str(d / "chunk*")):
        shutil.rmtree(sub)
    _order_files(d)

    stream = (
        spark.readStream.schema(df_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    got = _run_stream(
        spark, streaming_machine_stats(stream, "minute"), "late_rollup"
    )
    batch = machine_stats(opcua_fixture(spark, 3600), "minute")

    key = (late_bucket, "ActualCycleTimeS")
    got_row = got.filter(
        (F.col("bucket") == F.lit(late_bucket)) & (F.col("metric") == key[1])
    ).collect()
    batch_row = batch.filter(
        (F.col("bucket") == F.lit(late_bucket)) & (F.col("metric") == key[1])
    ).collect()
    assert len(got_row) == 1 and len(batch_row) == 1
    # batch sees one more sample (the late row) than the stream did
    assert batch_row[0]["sample_count"] == got_row[0]["sample_count"] + 1
    assert batch_row[0]["min_value"] != got_row[0]["min_value"] or (
        batch_row[0]["avg_value"] != got_row[0]["avg_value"]
    )


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """session_window (streaming) produces the same sessions as the
    lag+cumsum batch formulation on time-ordered input."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    rows = ev.orderBy("ts", "event_id").collect()
    d = tmp_path / "ev"
    d.mkdir()
    n = len(rows)
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        spark.createDataFrame(rows[lo:hi], ev.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    files = sorted(glob.glob(str(d / "c*" / "part-*.parquet")))
    for i, f in enumerate(files):
        shutil.move(f, str(d / f"{i:02d}.parquet"))
    for sub in glob.glob(str(d / "c[01]")):
        shutil.rmtree(sub)
    _order_files(d)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    got = _run_stream(spark, streaming_sessionize(stream), "sess_stream")
    batch = sessionize(ev).select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )

    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    got_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    batch_rows = sorted(tuple(r[c] for c in cols) for r in batch.collect())
    # the stream can only emit sessions closed by the final watermark;
    # every emitted session must match a batch session exactly, and
    # most sessions should have closed.
    batch_set = set(batch_rows)
    assert len(got_rows) > 0
    for r in got_rows:
        assert r in batch_set, r
    assert len(got_rows) >= len(batch_rows) * 0.8

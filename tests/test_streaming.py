"""Batch ≡ stream equivalence (SURVEY.md §5.4).

The same input rows go through (a) the batch operators and (b) the
Structured Streaming jobs fed by a 3-file replay source (so state
crosses micro-batch boundaries); outputs must agree — including the
watermark contract for rollups: buckets closed by the watermark match
the batch rollup exactly, late/open buckets are simply not emitted yet.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators import alarms as batch_alarms
from opc_ua_data_pipeline_spark.operators.ingest import telemetry_transform
from opc_ua_data_pipeline_spark.operators.rollups import machine_stats
from opc_ua_data_pipeline_spark.streaming import alarms as stream_alarms
from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.streaming.rollup import streaming_machine_stats
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    """sf0.001 events sorted by time, split into 3 parquet files so the
    replay source delivers 3 micro-batches in event-time order."""
    out = tmp_path_factory.mktemp("events_replay")
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id").collect()
    n = len(ev)
    ev_df = spark.createDataFrame(ev)
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        chunk = spark.createDataFrame(ev[lo:hi], ev_df.schema)
        chunk.coalesce(1).write.parquet(str(out / f"chunk_{i}"))
    # flatten: move part files up so readStream sees 3 files
    import glob
    import shutil

    files = sorted(glob.glob(str(out / "chunk_*" / "part-*.parquet")))
    for i, f in enumerate(files):
        shutil.move(f, str(out / f"{i:02d}.parquet"))
    for d in glob.glob(str(out / "chunk_*")):
        shutil.rmtree(d)
    return str(out)


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df, cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_rollup_stream_matches_batch(spark, replay_dir):
    stream = streaming_machine_stats(
        telemetry_transform(file_stream(spark, replay_dir)), "minute"
    )
    got = _run_stream(spark, stream, "rollup_stream")

    batch = machine_stats(telemetry_transform(load_table(spark, SF_DIR, "events")), "minute")
    cols = ["bucket", "metric", "avg_value", "min_value", "max_value", "sample_count"]
    got_rows = _rows(got, cols)
    batch_by_key = {(r[0], r[1]): r for r in _rows(batch, cols)}

    assert len(got_rows) > 0, "watermark should have closed some buckets"
    # Every emitted bucket must equal its batch twin exactly.
    for r in got_rows:
        assert batch_by_key[(r[0], r[1])] == r
    # Buckets the stream did not emit must all be near the stream end
    # (still open w.r.t. the final committed watermark).
    emitted = {(r[0], r[1]) for r in got_rows}
    missing_buckets = [k[0] for k in batch_by_key if k not in emitted]
    if missing_buckets:
        max_ts = load_table(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
        horizon = min(missing_buckets)
        # nothing older than the last micro-batch's span + watermark delay
        # should be missing; the replay splits ~10 days per batch, so use
        # the batch-2 boundary as a loose bound: all missing buckets must
        # lie in the final third of event time.
        span = (max_ts - horizon).total_seconds()
        total = (
            max_ts
            - load_table(spark, SF_DIR, "events").agg(F.min("ts")).collect()[0][0]
        ).total_seconds()
        assert span < total / 2, f"early bucket missing from stream: {horizon}"


def test_deviation_stream_matches_batch(spark, replay_dir):
    stream = stream_alarms.deviation_alarm_stream(
        telemetry_transform(file_stream(spark, replay_dir))
    )
    got = _run_stream(spark, stream, "dev_stream")
    batch = batch_alarms.q_deviation_alarms(spark, SF_DIR)
    cols = ["metric", "time", "event_id", "pct", "alarm"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_edge_stream_matches_batch(spark, replay_dir):
    stream = stream_alarms.edge_alarm_stream(
        telemetry_transform(file_stream(spark, replay_dir))
    )
    got = _run_stream(spark, stream, "edge_stream")
    batch = batch_alarms.q_edge_alarms(spark, SF_DIR)
    cols = ["metric", "operator", "time", "event_id", "value_num", "prev_value", "alarm"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_latch_stream_matches_batch(spark, replay_dir):
    stream = stream_alarms.latched_error_stream(
        telemetry_transform(file_stream(spark, replay_dir))
    )
    got = _run_stream(spark, stream, "latch_stream")
    batch = batch_alarms.q_latched_error(spark, SF_DIR)
    cols = ["operator", "time", "event_id", "metric", "current_error"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_bronze_ingest_stream(spark, replay_dir, tmp_path):
    from opc_ua_data_pipeline_spark.streaming.ingest import start_bronze_ingest

    out = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    q = start_bronze_ingest(file_stream(spark, replay_dir), out, ckpt, trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    batch = telemetry_transform(load_table(spark, SF_DIR, "events"))
    cols = ["time", "metric", "value_num", "value_str", "operator", "event_id"]
    assert _rows(got, cols) == _rows(batch, cols)
    # date-partitioned layout (hypertable-chunk equivalent)
    import os

    assert any(p.startswith("date=") for p in os.listdir(out))


def test_sliding_rollup_stream_matches_batch(spark, replay_dir):
    from opc_ua_data_pipeline_spark.operators.rollups import (
        machine_stats_sliding,
    )
    from opc_ua_data_pipeline_spark.streaming.rollup import (
        streaming_machine_stats_sliding,
    )

    stream = streaming_machine_stats_sliding(
        telemetry_transform(file_stream(spark, replay_dir))
    )
    got = _run_stream(spark, stream, "sliding_stream")

    batch = machine_stats_sliding(
        telemetry_transform(load_table(spark, SF_DIR, "events"))
    )
    cols = [
        "bucket_start",
        "metric",
        "avg_value",
        "min_value",
        "max_value",
        "sample_count",
    ]
    got_rows = _rows(got, cols)
    batch_by_key = {(r[0], r[1]): r for r in _rows(batch, cols)}

    assert len(got_rows) > 0
    # Every window the stream closed must equal its batch twin exactly
    # (bit-for-bit: decimal partial sums are order-independent).
    for r in got_rows:
        assert batch_by_key[(r[0], r[1])] == r


def test_m4_stream_matches_batch(spark, replay_dir):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        m4_downsample,
    )
    from opc_ua_data_pipeline_spark.streaming.rollup import (
        streaming_m4_downsample,
    )

    stream = streaming_m4_downsample(
        telemetry_transform(file_stream(spark, replay_dir))
    )
    got = _run_stream(spark, stream, "m4_stream")

    batch = m4_downsample(telemetry_transform(load_table(spark, SF_DIR, "events")))
    cols = [
        "bucket",
        "metric",
        "first_value",
        "last_value",
        "min_value",
        "max_value",
        "n_samples",
    ]
    got_rows = _rows(got, cols)
    batch_by_key = {(r[0], r[1]): r for r in _rows(batch, cols)}

    assert len(got_rows) > 0, "watermark should have closed some buckets"
    # Every closed bucket equals its batch twin bit-for-bit: min/max
    # and the min_by/max_by first/last are all order-independent
    # mergeable aggregates.
    for r in got_rows:
        assert batch_by_key[(r[0], r[1])] == r


def test_candlestick_stream_matches_batch(spark, replay_dir):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        candlestick_agg,
    )
    from opc_ua_data_pipeline_spark.streaming.rollup import (
        streaming_candlestick,
    )

    stream = streaming_candlestick(
        telemetry_transform(file_stream(spark, replay_dir))
    )
    got = _run_stream(spark, stream, "candlestick_stream")

    batch = candlestick_agg(
        telemetry_transform(load_table(spark, SF_DIR, "events"))
    )
    cols = [
        "bucket",
        "metric",
        "open_value",
        "high_value",
        "low_value",
        "close_value",
        "open_key",
        "close_key",
        "n_samples",
    ]
    got_rows = _rows(got, cols)
    batch_by_key = {(r[0], r[1]): r for r in _rows(batch, cols)}

    assert len(got_rows) > 0, "watermark should have closed some candles"
    # Every closed hour candle equals its batch twin bit-for-bit,
    # including the open/close order keys the merge step consumes.
    for r in got_rows:
        assert batch_by_key[(r[0], r[1])] == r

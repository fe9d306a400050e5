"""Streamed daily histogram partials ≡ batch, and the sliding-p95
re-merge over the STREAMED partials reproduces the batch operator —
the serving-layer contract of sliding_p95_histogram end to end."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.ingest import telemetry, telemetry_transform
from opc_ua_data_pipeline_spark.operators.sketch import (
    daily_value_histogram,
    sliding_histogram_quantile,
    sliding_quantile_from_partials,
)
from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.streaming.rollup import (
    streaming_daily_value_histogram,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_hist_partials_and_quantile_match_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay_hq"
    d.mkdir()
    half = len(rows) // 2
    for i, chunk in enumerate([rows[:half], rows[half:]]):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

    tel_stream = telemetry_transform(file_stream(spark, str(d)))
    q = (
        streaming_daily_value_histogram(tel_stream)
        .writeStream.format("memory")
        .queryName("hq_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT * FROM hq_stream")

    batch_hist = daily_value_histogram(telemetry(spark, SF_DIR))
    got = {
        (r.metric, str(r.day), r.bucket): r.n for r in streamed.collect()
    }
    want = {
        (r.metric, str(r.day), r.bucket): r.n for r in batch_hist.collect()
    }
    # append mode withholds watermark-open days; everything emitted
    # must match batch exactly, and all but the tail day must close
    assert got
    open_days = {k[1] for k in want} - {k[1] for k in got}
    assert len(open_days) <= 1
    for k, n in got.items():
        assert want[k] == n

    # the serving-layer re-merge over STREAMED partials == the batch
    # operator, restricted to fully-closed windows (a window is only
    # comparable when every day it covers was emitted)
    q_stream = {
        (r.metric, str(r.window_end)): (r.n_window, r.q_bucket, r.q_value_lo)
        for r in sliding_quantile_from_partials(streamed).collect()
    }
    q_batch = {
        (r.metric, str(r.window_end)): (r.n_window, r.q_bucket, r.q_value_lo)
        for r in sliding_histogram_quantile(telemetry(spark, SF_DIR)).collect()
    }
    comparable = {
        k for k in q_batch if k[1] not in open_days and k in q_stream
    }
    assert comparable
    for k in comparable:
        assert q_stream[k] == q_batch[k]

"""Streaming counter_agg / uptime_agg ≡ batch, bit-for-bit.

The incremental maintenance the reference gets from continuous
aggregates (database/init.sql:31-34,51-54) — the stream emits the
updated per-metric aggregate each micro-batch; the LAST emitted row
per metric must equal the batch hyperfunction exactly, including the
DECIMAL(38,6)-quantized delta sum and the exact integer uptime spans.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
    counter_agg,
    state_durations,
    time_weighted_avg,
    uptime_agg,
)
from opc_ua_data_pipeline_spark.operators.ingest import telemetry, telemetry_transform
from opc_ua_data_pipeline_spark.streaming.hyperfunctions import (
    counter_agg_stream,
    state_durations_stream,
    time_weighted_avg_stream,
    uptime_agg_stream,
)
from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("events_replay_hyper")
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    n = len(rows)
    for i, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        spark.createDataFrame(rows[lo:hi], ev.schema).coalesce(1).write.parquet(
            str(out / f"chunk_{i}")
        )
    files = sorted(glob.glob(str(out / "chunk_*" / "part-*.parquet")))
    for i, f in enumerate(files):
        shutil.move(f, str(out / f"{i:02d}.parquet"))
    for d in glob.glob(str(out / "chunk_*")):
        shutil.rmtree(d)
    for i, f in enumerate(sorted(glob.glob(str(out / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))
    return str(out)


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


def _final_per_metric(rows, progress_col):
    """Last emitted aggregate per metric = the row with the highest
    sample/ping count (monotone across micro-batches)."""
    best = {}
    for r in rows:
        if r["metric"] not in best or r[progress_col] > best[r["metric"]][progress_col]:
            best[r["metric"]] = r
    return best


def test_counter_stream_matches_batch(spark, replay_dir):
    out = _run_stream(
        spark,
        counter_agg_stream(telemetry_transform(file_stream(spark, replay_dir))),
        "counter_stream",
    )
    rows = out.collect()
    # 3 micro-batches -> up to 3 emissions per metric
    assert len(rows) > len({r["metric"] for r in rows})
    final = _final_per_metric(rows, "n_samples")
    batch = {r["metric"]: r for r in counter_agg(telemetry(spark, SF_DIR)).collect()}
    assert set(final) == set(batch)
    for m, b in batch.items():
        s = final[m]
        assert (s["counter_delta"], s["n_resets"], s["rate_per_sec"]) == (
            b["counter_delta"],
            b["n_resets"],
            b["rate_per_sec"],
        ), m


def test_twa_stream_matches_batch(spark, replay_dir):
    out = _run_stream(
        spark,
        time_weighted_avg_stream(
            telemetry_transform(file_stream(spark, replay_dir))
        ),
        "twa_stream",
    )
    rows = out.collect()
    assert len(rows) > len({r["metric"] for r in rows})
    final = _final_per_metric(rows, "n_weighted_samples")
    batch = {
        r["metric"]: r
        for r in time_weighted_avg(telemetry(spark, SF_DIR)).collect()
    }
    assert set(final) == set(batch)
    for m, b in batch.items():
        s = final[m]
        assert (
            s["time_weighted_avg"],
            s["total_weight_micros"],
            s["n_weighted_samples"],
        ) == (
            b["time_weighted_avg"],
            b["total_weight_micros"],
            b["n_weighted_samples"],
        ), m


def test_state_durations_stream_matches_batch(spark, replay_dir):
    out = _run_stream(
        spark,
        state_durations_stream(
            telemetry_transform(file_stream(spark, replay_dir))
        ),
        "state_dur_stream",
    )
    rows = out.collect()
    # final snapshot per operator = rows tagged with its max op_samples
    latest = {}
    for r in rows:
        if (
            r["operator"] not in latest
            or r["op_samples"] > latest[r["operator"]]
        ):
            latest[r["operator"]] = r["op_samples"]
    final = {
        (r["operator"], r["state"]): r
        for r in rows
        if r["op_samples"] == latest[r["operator"]]
    }
    batch = {
        (r["operator"], r["state"]): r
        for r in state_durations(telemetry(spark, SF_DIR)).collect()
    }
    assert set(final) == set(batch)
    for k, b in batch.items():
        s = final[k]
        assert (
            s["duration_micros"],
            s["n_entries"],
            s["n_samples"],
        ) == (b["duration_micros"], b["n_entries"], b["n_samples"]), k


def test_uptime_stream_matches_batch(spark, replay_dir):
    out = _run_stream(
        spark,
        uptime_agg_stream(telemetry_transform(file_stream(spark, replay_dir))),
        "uptime_stream",
    )
    rows = out.collect()
    assert len(rows) > len({r["metric"] for r in rows})
    final = _final_per_metric(rows, "n_pings")
    batch = {r["metric"]: r for r in uptime_agg(telemetry(spark, SF_DIR)).collect()}
    assert set(final) == set(batch)
    for m, b in batch.items():
        s = final[m]
        assert (s["n_intervals"], s["uptime_micros"]) == (
            b["n_intervals"],
            b["uptime_micros"],
        ), m

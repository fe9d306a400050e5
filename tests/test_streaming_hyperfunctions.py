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


def test_disordered_rows_dropped_and_counted(spark, tmp_path):
    """Cross-micro-batch disorder contract: a row arriving in a LATER
    micro-batch with event time behind its key's applied frontier is
    DROPPED (never a negative dt / phantom reset) and surfaced in the
    n_disordered output column; ordered rows keep the exact batch
    semantics."""
    import pandas as pd

    from opc_ua_data_pipeline_spark.streaming.hyperfunctions import (
        counter_agg_stream,
        uptime_agg_stream,
    )

    d = tmp_path / "replay"
    d.mkdir()

    def write(name, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["time", "event_id", "metric", "value_num"]
        )
        pdf["time"] = pd.to_datetime(pdf["time"])
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        import glob as g
        import os
        import shutil

        f = g.glob(str(tmp_path / name / "part-*.parquet"))[0]
        dst = str(d / f"{name}.parquet")
        shutil.move(f, dst)
        os.utime(dst, (mtime, mtime))

    write(
        "00",
        [
            ("2024-01-01 00:00:00", 1, "m", 1.0),
            ("2024-01-01 00:00:30", 2, "m", 2.0),
            ("2024-01-01 00:01:00", 3, "m", 3.0),
        ],
        1700000000,
    )
    write(
        "01",
        [
            # behind the frontier (00:01:00) -> must be dropped
            ("2024-01-01 00:00:45", 4, "m", 100.0),
            ("2024-01-01 00:01:30", 5, "m", 4.0),
        ],
        1700000060,
    )

    stream = spark.readStream.option("maxFilesPerTrigger", 1).schema(
        "time timestamp, event_id long, metric string, value_num double"
    ).parquet(str(d))

    got = _run_stream(spark, counter_agg_stream(stream), "counter_disorder")
    final = _final_per_metric(got.collect(), "n_samples")["m"]
    # 1→2→3→4 applied in order: delta 3, no resets (the dropped 100.0
    # would have minted a phantom reset), one disordered row counted
    assert final["counter_delta"] == 3.0
    assert final["n_resets"] == 0
    assert final["n_samples"] == 4
    assert final["n_disordered"] == 1

    got_up = _run_stream(spark, uptime_agg_stream(stream), "uptime_disorder")
    fin_up = _final_per_metric(got_up.collect(), "n_pings")["m"]
    assert fin_up["n_pings"] == 4
    assert fin_up["n_disordered"] == 1
    # one merged interval 00:00:00 -> 00:01:30 (gaps <= tolerance)
    assert fin_up["n_intervals"] == 1
    assert fin_up["uptime_micros"] == 90_000_000


def test_gapfill_stream_matches_batch_prefix(spark, replay_dir):
    """Every (metric, bucket) the stream emits — observed averages AND
    LOCF gap rows — must equal the batch gapfill_locf row exactly; the
    only rows the stream may withhold are each metric's still-open
    tail bucket (append semantics)."""
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        time_bucket_gapfill,
    )
    from opc_ua_data_pipeline_spark.streaming.hyperfunctions import (
        gapfill_locf_stream,
    )

    out = _run_stream(
        spark,
        gapfill_locf_stream(telemetry_transform(file_stream(spark, replay_dir))),
        "gapfill_stream",
    )
    got = {
        (r["metric"], r["bucket"]): (r["avg_value"], r["is_gap"])
        for r in out.collect()
    }
    assert len(got) > 0
    batch = {
        (r["metric"], r["bucket"]): (r["avg_value"], r["is_gap"])
        for r in time_bucket_gapfill(telemetry(spark, SF_DIR)).collect()
    }
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch.get(k))
    # the stream must have closed all but the tail bucket per metric
    per_metric_batch = {}
    for (m, b), _ in batch.items():
        per_metric_batch.setdefault(m, set()).add(b)
    for m, buckets in per_metric_batch.items():
        emitted = {b for (mm, b) in got if mm == m}
        missing = buckets - emitted
        assert len(missing) <= 1, (m, sorted(missing)[:3])


def test_gapfill_interp_stream_matches_batch_prefix(spark, replay_dir):
    """Linear-interpolation gapfill on the stream: every emitted row
    (observed average or interpolated gap) equals the batch
    gapfill_interpolate row bit-for-bit; the only withheld rows are
    the open tail bucket and the not-yet-anchored gaps after the last
    emitted observation (all strictly newer than anything emitted)."""
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        gapfill_interpolate,
    )
    from opc_ua_data_pipeline_spark.streaming.hyperfunctions import (
        gapfill_interpolate_stream,
    )

    out = _run_stream(
        spark,
        gapfill_interpolate_stream(
            telemetry_transform(file_stream(spark, replay_dir))
        ),
        "gapfill_interp_stream",
    )
    got = {
        (r["metric"], r["bucket"]): (r["avg_value"], r["is_gap"])
        for r in out.collect()
    }
    assert len(got) > 0
    assert any(v[1] for v in got.values()), "expected interpolated gaps"
    batch = {
        (r["metric"], r["bucket"]): (r["value"], r["is_gap"])
        for r in gapfill_interpolate(telemetry(spark, SF_DIR)).collect()
    }
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch.get(k))
    last_emitted = {}
    for (m, b) in got:
        if m not in last_emitted or b > last_emitted[m]:
            last_emitted[m] = b
    for (m, b) in batch:
        if (m, b) not in got:
            assert b > last_emitted[m], (m, b, last_emitted[m])


def test_trend_stream_matches_batch(spark, replay_dir):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import trend_slope
    from opc_ua_data_pipeline_spark.streaming.hyperfunctions import (
        trend_slope_stream,
    )

    out = _run_stream(
        spark,
        trend_slope_stream(telemetry_transform(file_stream(spark, replay_dir))),
        "trend_stream",
    )
    rows = out.collect()
    assert len(rows) > len({r["metric"] for r in rows})
    final = _final_per_metric(rows, "n_samples")
    batch = {r["metric"]: r for r in trend_slope(telemetry(spark, SF_DIR)).collect()}
    assert set(final) == set(batch)
    for m, b in batch.items():
        s = final[m]
        assert (s["slope_per_sec"], s["intercept"], s["n_samples"]) == (
            b["slope_per_sec"],
            b["intercept"],
            b["n_samples"],
        ), m
        assert s["n_disordered"] == 0


def test_lttb_stream_matches_batch(spark, replay_dir):
    """Closed-and-emitted LTTB buckets equal the batch time-bucketed
    operator bit-for-bit (values, selected sample times, buckets);
    only each metric's tail (the open bucket + the pending bucket
    still awaiting its successor's average) may be missing."""
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        lttb_time_bucketed,
    )
    from opc_ua_data_pipeline_spark.streaming.hyperfunctions import (
        lttb_stream,
    )

    out = _run_stream(
        spark,
        lttb_stream(telemetry_transform(file_stream(spark, replay_dir))),
        "lttb_stream",
    )
    got = {
        (r["metric"], r["bucket"]): (r["time"], r["value"])
        for r in out.collect()
    }
    assert got, "expected some closed buckets"
    batch = {
        (r["metric"], r["bucket"]): (r["time"], r["value"])
        for r in lttb_time_bucketed(telemetry(spark, SF_DIR)).collect()
    }
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch.get(k))
    # nothing but the per-metric tail is missing
    last_emitted = {}
    for (m, b) in got:
        if m not in last_emitted or b > last_emitted[m]:
            last_emitted[m] = b
    for (m, b) in batch:
        if (m, b) not in got:
            assert m not in last_emitted or b > last_emitted[m], (m, b)

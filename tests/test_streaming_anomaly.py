"""Streaming z-score ≡ batch rolling_zscore, bit-for-bit."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.anomaly import rolling_zscore
from opc_ua_data_pipeline_spark.streaming.anomaly import zscore_stream
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


def test_zscore_stream_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay"
    d.mkdir()
    third = len(rows) // 3
    for i, chunk in enumerate(
        [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    ):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)

    out = _run_stream(
        spark, zscore_stream(file_stream(spark, str(d))), "zscore_stream"
    )
    cols = ["event_id", "ts", "key", "value", "n_prev", "roll_mean", "zscore"]
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    want = sorted(
        tuple(r[c] for c in cols)
        for r in rolling_zscore(load_table(spark, SF_DIR, "events")).collect()
    )
    assert len(got) == len(want)
    # bit-for-bit, including the float mean/z columns
    assert got == want
    # sanity: scored region reached
    assert any(t[6] is not None for t in got)

def test_zscore_stream_survives_restart(spark, tmp_path):
    """Kill the query between micro-batches and restart from the
    checkpoint: keyed ring-buffer state must resume, and the combined
    output must still equal the batch operator exactly."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay"
    d.mkdir()
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], ev.schema).coalesce(1).write.parquet(
        str(d / "c0")
    )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def start():
        return (
            zscore_stream(file_stream(spark, str(d)))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()

    # second half arrives while the query is DOWN
    spark.createDataFrame(rows[half:], ev.schema).coalesce(1).write.parquet(
        str(d / "c1")
    )
    for f in sorted(glob.glob(str(d / "c1" / "part-*.parquet"))):
        os.rename(f, str(d / "99.parquet"))
    os.utime(str(d / "99.parquet"), (1700009999, 1700009999))

    q = start()
    q.processAllAvailable()
    q.stop()

    got_df = spark.read.schema(
        "event_id long, ts timestamp, key string, value double, "
        "n_prev long, roll_mean double, zscore double"
    ).parquet(out_dir)
    cols = ["event_id", "ts", "key", "value", "n_prev", "roll_mean", "zscore"]
    got = sorted(tuple(r[c] for c in cols) for r in got_df.collect())
    want = sorted(
        tuple(r[c] for c in cols)
        for r in rolling_zscore(load_table(spark, SF_DIR, "events")).collect()
    )
    assert got == want


def test_seasonal_stream_matches_batch(spark, tmp_path):
    from opc_ua_data_pipeline_spark.operators.anomaly import (
        seasonal_anomalies,
        seasonal_profile,
    )
    from opc_ua_data_pipeline_spark.operators.ingest import telemetry
    from opc_ua_data_pipeline_spark.streaming.anomaly import seasonal_stream

    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay_seasonal"
    d.mkdir()
    half = len(rows) // 2
    for i, chunk in enumerate([rows[:half], rows[half:]]):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)

    tel = telemetry(spark, SF_DIR)
    profile = seasonal_profile(tel)
    out = _run_stream(
        spark,
        seasonal_stream(
            file_stream(spark, str(d)), profile,
            z_threshold=1.5, min_samples=3,
        ),
        "seasonal_stream",
    )
    cols = ["event_id", "metric", "time", "value_num", "hod", "hod_mean",
            "zscore"]
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    want = sorted(
        tuple(r[c] for c in cols)
        for r in seasonal_anomalies(
            tel, z_threshold=1.5, min_samples=3
        ).collect()
    )
    assert got == want and got


def test_record_high_stream_matches_batch(spark, tmp_path):
    from opc_ua_data_pipeline_spark.operators.dominance import record_highs
    from opc_ua_data_pipeline_spark.streaming.anomaly import (
        record_high_stream,
    )

    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay_records"
    d.mkdir()
    third = len(rows) // 3
    for i, chunk in enumerate(
        [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    ):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)

    out = _run_stream(
        spark, record_high_stream(file_stream(spark, str(d))), "record_stream"
    )
    cols = ["event_id", "ts", "key", "value", "prev_max"]
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    want = sorted(
        tuple(r[c] for c in cols)
        for r in record_highs(load_table(spark, SF_DIR, "events")).collect()
    )
    assert got == want and got
    # ordered replay: nothing dropped
    assert all(r["n_disordered"] == 0 for r in out.collect())


def test_record_high_equal_rereading_does_not_realert(spark):
    import datetime

    from opc_ua_data_pipeline_spark.operators.dominance import record_highs

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "k", 5.0, "{}"),
        (2, base + datetime.timedelta(hours=1), 1, "k", 5.0, "{}"),  # equal
        (3, base + datetime.timedelta(hours=2), 1, "k", 7.0, "{}"),  # record
        (4, base + datetime.timedelta(hours=3), 1, "k", 6.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = sorted(r["event_id"] for r in record_highs(df).collect())
    assert got == [1, 3]


def test_ewma_stream_matches_batch(spark, tmp_path):
    """Streaming quantized-weight EWMA ≡ batch ewma_smooth bit-for-bit
    (integer dot products with shared weight tables; the one float
    division happens on identical exact integers)."""
    from opc_ua_data_pipeline_spark.operators.anomaly import ewma_smooth
    from opc_ua_data_pipeline_spark.streaming.anomaly import ewma_stream

    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay"
    d.mkdir()
    third = len(rows) // 3
    for i, chunk in enumerate(
        [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    ):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)

    out = _run_stream(
        spark, ewma_stream(file_stream(spark, str(d))), "ewma_stream"
    )
    cols = ["event_id", "ts", "key", "value", "n_taps", "ewma"]
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    want = sorted(
        tuple(r[c] for c in cols)
        for r in ewma_smooth(load_table(spark, SF_DIR, "events")).collect()
    )
    assert len(got) == len(want)
    assert got == want
    assert any(t[4] > 1 for t in got)  # multi-tap region reached

"""Streaming Hampel ≡ batch hampel_despike on every CLOSED frame (all
rows except each key's trailing `half`), bit-for-bit, across a
multi-batch replay."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.anomaly import (
    HAMPEL_HALF,
    hampel_despike,
)
from opc_ua_data_pipeline_spark.streaming.anomaly import hampel_stream
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


def test_hampel_stream_matches_batch_on_closed_frames(spark, tmp_path):
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
        spark, hampel_stream(file_stream(spark, str(d))), "hampel_stream"
    )
    cols = [
        "event_id", "key", "value", "roll_median", "roll_mad",
        "is_spike", "repaired",
    ]
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())

    batch = hampel_despike(load_table(spark, SF_DIR, "events")).collect()
    # drop each key's trailing `half` rows: their frames never close
    by_key: dict = {}
    for r in sorted(batch, key=lambda r: (r["ts"], r["event_id"])):
        by_key.setdefault(r["key"], []).append(r)
    want = sorted(
        tuple(r[c] for c in cols)
        for rs in by_key.values()
        for r in rs[: len(rs) - HAMPEL_HALF]
    )
    assert len(got) == len(want) > 0
    assert got == want
    assert all(r["n_disordered"] == 0 for r in out.collect())

"""Streaming per-day fingerprints ≡ batch table_fingerprint on every
closed day — the mergeable-checksum property, end to end."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.dq import table_fingerprint
from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.streaming.rollup import (
    streaming_table_fingerprint,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_fingerprint_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay_fp"
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
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

    q = (
        streaming_table_fingerprint(file_stream(spark, str(d)))
        .writeStream.format("memory")
        .queryName("fp_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["day"]: r for r in spark.sql("SELECT * FROM fp_stream").collect()
    }
    want = {
        r["day"]: r
        for r in table_fingerprint(load_table(spark, SF_DIR, "events")).collect()
    }
    # append mode emits only watermark-CLOSED days; every emitted day
    # must match batch bit-for-bit, and most days must have closed
    assert got and len(got) >= len(want) - 1
    cols = ["n_rows", "hash_sum", "hash_xor", "hash_min", "hash_max"]
    for day, r in got.items():
        assert tuple(r[c] for c in cols) == tuple(want[day][c] for c in cols)

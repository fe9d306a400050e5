"""Streaming KMV: the last emitted row per key equals the batch
sketch exactly (hashes and the single-division estimate), and arrival
order cannot change it."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.sketch import kmv_distinct
from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.streaming.sketch import kmv_distinct_stream
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


def _replay_dir(spark, rows, schema, d, chunks=3):
    d.mkdir()
    n = max(1, len(rows) // chunks)
    for i in range(chunks):
        chunk = rows[i * n :] if i == chunks - 1 else rows[i * n : (i + 1) * n]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(d / f"c{i}")
            )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)


def test_kmv_stream_final_rows_equal_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    rows = ev.orderBy("ts", "event_id").collect()
    d = tmp_path / "replay"
    _replay_dir(spark, rows, ev.schema, d)

    out = _run_stream(
        spark, kmv_distinct_stream(file_stream(spark, str(d))), "kmv_stream"
    ).collect()
    # last emitted row per key (memory sink appends one row per key
    # per micro-batch; the final one holds the full-stream sketch)
    last: dict = {}
    for r in out:  # rows arrive in batch order within the sink
        last[r["event_type"]] = r
    want = {
        r["event_type"]: r for r in kmv_distinct(ev).collect()
    }
    assert set(last) == set(want)
    for k, b in want.items():
        s = last[k]
        assert s["n_sketch"] == b["n_sketch"]
        assert s["kth_hash"] == b["kth_hash"]
        assert s["distinct_est"] == b["distinct_est"]


def test_kmv_stream_is_order_insensitive(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    fwd = ev.orderBy("ts", "event_id").collect()
    rev = list(reversed(fwd))
    d1, d2 = tmp_path / "fwd", tmp_path / "rev"
    _replay_dir(spark, fwd, ev.schema, d1)
    _replay_dir(spark, rev, ev.schema, d2)
    a = _run_stream(
        spark, kmv_distinct_stream(file_stream(spark, str(d1))), "kmv_fwd"
    ).collect()
    b = _run_stream(
        spark, kmv_distinct_stream(file_stream(spark, str(d2))), "kmv_rev"
    ).collect()
    fin = lambda rows: {
        r["event_type"]: (r["n_sketch"], r["kth_hash"], r["distinct_est"])
        for r in rows
    }
    assert fin(a) == fin(b)

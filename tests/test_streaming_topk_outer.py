"""Streaming top-k (complete + incremental merge) and the stream-stream
LEFT OUTER interval join, each checked against its batch twin."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.relational import (
    incident_range_join,
)
from opc_ua_data_pipeline_spark.streaming.correlate import (
    incident_stream_left_join,
)
from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.streaming.topk import (
    batch_topk,
    start_topk_merge,
    topk_complete,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _order_files(d):
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))


def _replay_dir(spark, tmp_path, n_chunks=3, closer_rows=None):
    """Split events into n time-ordered parquet files (+ an optional
    far-future 'closer' file that only advances the watermark)."""
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay"
    d.mkdir()
    chunk = len(rows) // n_chunks
    parts = [
        rows[i * chunk : (i + 1) * chunk if i < n_chunks - 1 else len(rows)]
        for i in range(n_chunks)
    ]
    if closer_rows is not None:
        parts.extend(closer_rows(rows))
    for i, part in enumerate(parts):
        spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    _order_files(d)
    return d


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_topk_complete_matches_batch(spark, tmp_path):
    d = _replay_dir(spark, tmp_path)
    q = (
        topk_complete(file_stream(spark, str(d)))
        .writeStream.format("memory")
        .queryName("topk_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _rows(
        spark.sql("SELECT * FROM topk_stream"),
        ["user_id", "total_spend", "n_events"],
    )
    want = _rows(
        batch_topk(load_table(spark, SF_DIR, "events")),
        ["user_id", "total_spend", "n_events"],
    )
    assert got == want
    assert len(got) == 10


def test_topk_merge_matches_batch_across_restart(spark, tmp_path):
    d = _replay_dir(spark, tmp_path)
    store = str(tmp_path / "store")
    topk = str(tmp_path / "topk")
    ckpt = str(tmp_path / "ckpt")

    # First run: only the first two files visible.  The parquet file
    # source lists EVERY file in the directory (extension-blind), so
    # hidden files must be stashed outside the replay dir entirely.
    stash_dir = tmp_path / "stash"
    stash_dir.mkdir()
    hidden = sorted(glob.glob(str(d / "*.parquet")))[2:]
    stash = [str(stash_dir / os.path.basename(f)) for f in hidden]
    for f, s in zip(hidden, stash):
        os.rename(f, s)
    q = start_topk_merge(file_stream(spark, str(d)), store, topk, ckpt)
    q.processAllAvailable()
    q.stop()

    # Restart with the remaining files revealed: the checkpoint must
    # resume (not recount) and the upsert store must converge.
    for f, s in zip(hidden, stash):
        os.rename(s, f)
    _order_files(d)
    q = start_topk_merge(file_stream(spark, str(d)), store, topk, ckpt)
    q.processAllAvailable()
    q.stop()

    got = _rows(
        spark.read.parquet(topk), ["user_id", "total_spend", "n_events"]
    )
    want = _rows(
        batch_topk(load_table(spark, SF_DIR, "events")),
        ["user_id", "total_spend", "n_events"],
    )
    assert got == want
    assert len(got) == 10


def test_stream_left_join_matches_batch(spark, tmp_path):
    # TWO far-future non-error closer files: outer rows emit in batch
    # N using the watermark established by batch N-1's data, so the
    # last incident (in the final real chunk) needs one batch BEYOND
    # the first watermark-advancing file — processAllAvailable does
    # not wait for Spark's asynchronous no-data flush batch.  Neither
    # closer joins anything (10-minute window, hours out).
    ev = load_table(spark, SF_DIR, "events")
    last = ev.orderBy(F.col("ts").desc()).limit(1)

    def _closer(hours, eid):
        return (
            last.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {hours} HOURS")
            )
            .withColumn("event_id", F.lit(eid).cast("long"))
            .withColumn("event_type", F.lit("view"))
            .collect()
        )

    closing = [_closer(2, -1), _closer(4, -2)]
    d = _replay_dir(spark, tmp_path, closer_rows=lambda rows: closing)

    q = (
        incident_stream_left_join(file_stream(spark, str(d)))
        .writeStream.format("memory")
        .queryName("left_corr")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM left_corr")

    cols = ["incident_id", "user_id", "event_id", "event_type", "lag_us"]
    inner = incident_range_join(ev)
    all_inc = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id"),
    )
    unmatched = all_inc.join(
        inner.select("incident_id").distinct(), "incident_id", "left_anti"
    ).select(
        "incident_id",
        "user_id",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("long").alias("lag_us"),
    )
    want_df = inner.select(
        "incident_id",
        "user_id",
        "event_id",
        "event_type",
        "lag_us",
    ).unionByName(unmatched)

    got = _rows(out, cols)
    want = _rows(want_df, cols)
    assert got == want
    # Both kinds of rows must actually occur for the test to mean much.
    assert unmatched.count() > 0
    assert inner.count() > 0

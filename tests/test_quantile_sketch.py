"""Mergeable rank-sampled quantile rollup: weights telescope to exact
counts, the merged estimate's rank error stays inside the stated
deterministic envelope (< N/cap + #partials), and the streaming twin
emits bit-identical closed-hour partials."""

from __future__ import annotations

import glob
import math
import os
from collections import defaultdict

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.rollups import (
    hour_quantile_partials,
    quantile_sketch_rollup,
)
from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.streaming.rollup import (
    streaming_hour_quantile_partials,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_partial_weights_telescope_to_exact_counts(spark):
    ev = load_table(spark, SF_DIR, "events")
    got = {
        (r.event_type, str(r.h)): r.s
        for r in hour_quantile_partials(ev)
        .groupBy("event_type", "h")
        .agg(F.sum("w").alias("s"))
        .collect()
    }
    want = {
        (r.event_type, str(r.h)): r.c
        for r in ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == want


def test_merged_estimate_within_rank_envelope(spark):
    # tiny cap so the stride actually fires on the small fixture
    cap = 8
    ev = load_table(spark, SF_DIR, "events")
    est = {
        (r.event_type, str(r.bucket)): (r.n_values, r.p50_est, r.p95_est)
        for r in quantile_sketch_rollup(ev, cap=cap).collect()
    }
    raw = defaultdict(list)
    hours = defaultdict(set)
    for r in (
        ev.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.to_date(F.date_trunc("hour", "ts")).alias("bucket"),
            F.date_trunc("hour", "ts").alias("h"),
            "value",
        )
        .collect()
    ):
        raw[(r.event_type, str(r.bucket))].append(r.value)
        hours[(r.event_type, str(r.bucket))].add(str(r.h))
    assert set(est) == set(raw)
    for key, vals in raw.items():
        vals.sort()
        n = len(vals)
        n_est, p50, p95 = est[key]
        assert n_est == n  # exact by telescoping
        envelope = n / cap + len(hours[key])
        for q, v in ((0.5, p50), (0.95, p95)):
            k = math.ceil(q * n)
            # true rank interval of the estimate value
            import bisect

            lo = bisect.bisect_left(vals, v) + 1
            hi = bisect.bisect_right(vals, v)
            dist = 0 if lo <= k <= hi else min(abs(k - lo), abs(k - hi))
            assert dist <= envelope, (key, q, v, k, lo, hi, envelope)


def test_streaming_partials_equal_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    d = tmp_path / "replay_qsk"
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

    q = (
        streaming_hour_quantile_partials(file_stream(spark, str(d)))
        .writeStream.format("memory")
        .queryName("qsk_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def keyed(rows):
        out = defaultdict(list)
        for r in rows:
            out[(r.event_type, str(r.h))].append((r.value, r.w))
        return {k: sorted(v) for k, v in out.items()}

    got = keyed(spark.sql("SELECT * FROM qsk_stream").collect())
    want = keyed(hour_quantile_partials(load_table(spark, SF_DIR, "events")).collect())
    # append mode withholds watermark-open hours; every emitted hour
    # must match the batch partial BIT-EXACTLY, and the stream must
    # have closed a substantial share of them
    assert got
    assert set(got) <= set(want)
    open_hours = set(want) - set(got)
    assert len(got) >= len(want) / 2, (len(got), len(want))
    for k, pts in got.items():
        assert want[k] == pts, k
    # every open hour is at the stream's tail (>= watermark cutoff)
    if open_hours:
        max_closed = max(h for _, h in got)
        assert all(h >= max_closed for _, h in open_hours)

"""Mergeable-HLL hierarchical rollup: union of minute sketches must
estimate the hour as well as a sketch built directly at the hour grain
— the property that lets a 100 TB serving layer answer any coarser
grain from stored partials without rescanning facts."""

from __future__ import annotations

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.rollups import (
    HLL_MERGE_RTOL,
    hll_rollup_merge,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_merged_minute_sketches_match_direct_hour_sketch(spark):
    ev = load_table(spark, SF_DIR, "events")
    direct = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct")
    )
    minute = ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("m")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = minute.groupBy(
        "event_type", F.date_trunc("hour", F.col("m")).alias("bucket")
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged"))
    rows = direct.join(merged, ["event_type", "bucket"]).collect()
    assert rows
    for r in rows:
        # register-max union: merged should track the direct sketch
        # within the sketch's own error envelope
        assert abs(r["merged"] - r["direct"]) <= max(
            2, HLL_MERGE_RTOL * r["direct"]
        ), r


def test_hll_rollup_merge_in_bounds_everywhere(spark):
    out = hll_rollup_merge(load_table(spark, SF_DIR, "events")).collect()
    assert out and all(r["merge_ok"] for r in out)


def test_streaming_distinct_rollup_tracks_batch_exact(spark, tmp_path):
    """Closed hourly buckets emitted by the streaming HLL rollup must
    estimate the batch exact distinct count within the sketch's error
    envelope, and each bucket must be emitted exactly once."""
    import glob
    import os

    from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
    from opc_ua_data_pipeline_spark.streaming.rollup import (
        streaming_distinct_rollup,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").orderBy("ts", "event_id")
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
        os.utime(str(d / f"{i:02d}.parquet"), (1700000000 + i, 1700000000 + i))

    out = streaming_distinct_rollup(file_stream(spark, str(d)))
    q = (
        out.writeStream.format("memory")
        .queryName("distinct_rollup_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM distinct_rollup_stream").collect()
    assert got, "watermark should have closed some hourly buckets"
    keys = [(r["bucket"], r["event_type"]) for r in got]
    assert len(keys) == len(set(keys)), "bucket emitted twice"

    exact = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in load_table(spark, sf, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in got:
        e = exact[(r["bucket"], r["event_type"])]
        assert abs(r["approx_users"] - e) <= max(2, 0.15 * e), (r, e)

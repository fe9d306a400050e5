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

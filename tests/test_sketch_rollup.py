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


def test_histogram_partials_merge_exactly(spark):
    """The percentile analog of the HLL merge test, but EXACT: the
    hour->day summed histogram must be bit-identical to binning the
    raw rows straight to day — bin counts are losslessly mergeable."""
    from opc_ua_data_pipeline_spark.operators.rollups import (
        HIST_BINS,
        HIST_LO,
        HIST_W,
        histogram_rollup_percentiles,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    via_hours = histogram_rollup_percentiles(ev)

    b = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(HIST_LO)) / F.lit(HIST_W)),
            F.lit(0),
        ),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    direct = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.to_date(F.col("ts")).alias("bucket"),
            b.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # compare the operator's day output against a direct-to-day twin
    # computed without the hour intermediate

    def percentiles_from(day_bins):
        from pyspark.sql import Window

        w_cum = (
            Window.partitionBy("event_type", "bucket")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_tot = Window.partitionBy("event_type", "bucket")
        cum = day_bins.select(
            "event_type",
            "bucket",
            "bin",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_tot).alias("n"),
        )
        edge = F.lit(HIST_LO) + F.col("bin").cast("double") * F.lit(HIST_W)
        return cum.groupBy("event_type", "bucket").agg(
            F.max("n").alias("n_values"),
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 1) div 2"), edge)
            ).alias("p50_lo"),
            F.min(
                F.when(F.col("cum") >= F.expr("(19 * n + 19) div 20"), edge)
            ).alias("p95_lo"),
        )

    a = sorted(map(tuple, via_hours.collect()))
    c = sorted(map(tuple, percentiles_from(direct).collect()))
    assert a == c and len(a) > 0


def test_streaming_histogram_partials_match_batch(spark, tmp_path):
    """Closed (hour, type, bin) counts from the stream equal the batch
    binning exactly — the streaming half of the mergeable-histogram
    rollup."""
    import glob
    import os
    import shutil

    from opc_ua_data_pipeline_spark.operators.rollups import (
        HIST_BINS,
        HIST_LO,
        HIST_W,
    )
    from opc_ua_data_pipeline_spark.streaming.rollup import (
        streaming_histogram_partials,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").orderBy(
        "ts", "event_id"
    )
    rows = ev.collect()
    out = tmp_path / "replay"
    out.mkdir()
    n = len(rows)
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        spark.createDataFrame(rows[lo:hi], ev.schema).coalesce(1).write.parquet(
            str(tmp_path / f"chunk_{i}")
        )
    files = sorted(glob.glob(str(tmp_path / "chunk_*" / "part-*.parquet")))
    for i, f in enumerate(files):
        dst = str(out / f"{i:02d}.parquet")
        shutil.move(f, dst)
        os.utime(dst, (1700000000 + i * 60,) * 2)

    stream = spark.readStream.option("maxFilesPerTrigger", 1).schema(
        ev.schema
    ).parquet(str(out))
    q = (
        streaming_histogram_partials(stream)
        .writeStream.format("memory")
        .queryName("hist_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["h"], r["event_type"], r["bin"]): r["cnt"]
        for r in spark.sql("SELECT * FROM hist_stream").collect()
    }

    b = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(HIST_LO)) / F.lit(HIST_W)),
            F.lit(0),
        ),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    batch = {
        (r["h"], r["event_type"], r["bin"]): r["cnt"]
        for r in load_table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "event_type",
            b.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert len(got) > 0
    for k, v in got.items():
        assert batch[k] == v, k

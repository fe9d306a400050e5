"""Streaming rollups — continuous-aggregate maintenance (G3/G4).

TimescaleDB policy -> Structured Streaming mapping (SURVEY.md §2.10):

| CA policy knob (init.sql:31-34,51-54) | Streaming equivalent       |
|---------------------------------------|----------------------------|
| refresh schedule (30 s / 30 min)      | trigger(processingTime)    |
| end_offset (1 min / 1 h)              | withWatermark delay        |
| start_offset (1 h / 3 d)              | state retention bound      |

Semantic contract (pinned by tests): for data arriving within
end_offset of event time, stream output ≡ the batch rollup
(operators/rollups.machine_stats).  Later stragglers are dropped by
the watermark, where the reference's refresh policy would still
revise a bucket within start_offset — reconciled, when needed, by a
periodic batch repair over the trailing start_offset window
(:func:`backfill`), which is also the bootstrap path.

State sizing at 100 TB: state rows = #open-buckets x #metrics —
independent of input volume; the shuffle carries partial aggregates
(HashAggregate partials into the state store), never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.rollups import machine_stats

GRANULARITY_SPEC = {
    # granularity: (window duration, watermark ≡ end_offset, trigger)
    "minute": ("1 minute", "1 minute", "30 seconds"),
    "hour": ("1 hour", "1 hour", "30 minutes"),
}


def streaming_machine_stats(telemetry: DataFrame, granularity: str) -> DataFrame:
    """Watermarked tumbling-window stats per metric over a *streaming*
    telemetry frame — same measures as the batch rollup.

    ``window(time, d).start`` equals ``date_trunc(d, time)`` for
    epoch-aligned minute/hour durations, so bucket keys line up with
    the batch/oracle form exactly.
    """
    duration, watermark, _ = GRANULARITY_SPEC[granularity]
    return (
        telemetry.filter(F.col("value_num").isNotNull())
        .withWatermark("time", watermark)
        .groupBy(F.window("time", duration), F.col("metric"))
        .agg(
            (
                F.sum(F.col("value_num").cast("decimal(28,6)")).cast("double")
                / F.count("value_num")
            ).alias("avg_value"),
            F.min("value_num").alias("min_value"),
            F.max("value_num").alias("max_value"),
            F.count("value_num").alias("sample_count"),
        )
        .select(
            F.col("window.start").alias("bucket"),
            "metric",
            "avg_value",
            "min_value",
            "max_value",
            "sample_count",
        )
    )


def start_rollup(
    telemetry: DataFrame,
    granularity: str,
    table_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Materialize the rollup: append mode emits each bucket exactly
    once when the watermark passes its close — the equivalent of a CA
    bucket becoming visible once it is end_offset old."""
    _, _, trigger = GRANULARITY_SPEC[granularity]
    return (
        streaming_machine_stats(telemetry, granularity)
        .writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=trigger)
        .outputMode("append")
        .start()
    )


def backfill(bronze: DataFrame, granularity: str) -> DataFrame:
    """Batch bootstrap/repair: recompute the rollup over history (or a
    trailing start_offset window) with the batch operator — used to
    seed the table before the stream takes over, and to reconcile
    stragglers the watermark dropped."""
    return machine_stats(bronze, granularity)


def streaming_machine_stats_sliding(
    telemetry: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming twin of ``rollups.machine_stats_sliding``: trailing
    5-minute stats emitted every minute.  Identical aggregation — the
    overlapping-window expansion happens in the partial-aggregate
    stage, so state rows = #open-windows x #metrics (a window stays
    open ``window + watermark`` of event time; 6 concurrent windows
    per metric here), never a function of input volume.  Append mode
    emits each window once, when the watermark passes its end."""
    return (
        telemetry.filter(F.col("value_num").isNotNull())
        .withWatermark("time", watermark)
        .groupBy(F.window("time", window, slide), F.col("metric"))
        .agg(
            (
                F.sum(F.col("value_num").cast("decimal(28,6)")).cast("double")
                / F.count("value_num")
            ).alias("avg_value"),
            F.min("value_num").alias("min_value"),
            F.max("value_num").alias("max_value"),
            F.count("value_num").alias("sample_count"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            "metric",
            "avg_value",
            "min_value",
            "max_value",
            "sample_count",
        )
    )


def streaming_distinct_rollup(events: DataFrame) -> DataFrame:
    """Watermarked hourly DISTINCT-USER rollup over the raw event
    stream via the HLL sketch (``approx_count_distinct``) — the
    streaming half of the mergeable-sketch story in
    operators/rollups.hll_rollup_merge: exact distinct aggregation is
    not incrementally maintainable (state would hold every user id
    seen per bucket), but the sketch state is a CONSTANT-size register
    set per (bucket, event_type), so the stream carries distinct
    counts at 100 TB with bounded state.

    Contract (tests/test_sketch_rollup.py): every emitted closed
    bucket's estimate is within the sketch's error envelope of the
    batch exact count; buckets are emitted once, on watermark close
    (append mode).
    """
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("bucket"),
            "event_type",
            "approx_users",
            "n_events",
        )
    )


def streaming_m4_downsample(
    telemetry: DataFrame, watermark: str = "1 minute"
) -> DataFrame:
    """Streaming twin of ``hyperfunctions.m4_downsample`` (the
    continuous-aggregate family, database/init.sql:31-54): per
    (metric, minute) first/last/min/max of the value, maintained
    incrementally.

    No keyed-state processor needed — all four measures are mergeable
    aggregates: min/max trivially, first/last via ``min_by``/``max_by``
    on the zero-padded (time, event_id) composite key (the exact key
    the batch operator and its DuckDB oracle share), whose partial
    state is one (key, value) pair per open bucket.  State rows =
    #open-buckets x #metrics, independent of input volume.  Append
    mode emits each bucket exactly once, on watermark close, equal to
    its batch twin bit-for-bit.
    """
    key = F.concat(
        F.lpad(F.unix_micros(F.col("time")).cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return (
        telemetry.filter(F.col("value_num").isNotNull())
        .withWatermark("time", watermark)
        .groupBy(F.window("time", "1 minute"), F.col("metric"))
        .agg(
            F.min_by("value_num", key).alias("first_value"),
            F.max_by("value_num", key).alias("last_value"),
            F.min("value_num").alias("min_value"),
            F.max("value_num").alias("max_value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col("window.start").alias("bucket"),
            "metric",
            "first_value",
            "last_value",
            "min_value",
            "max_value",
            "n_samples",
        )
    )


def streaming_histogram_partials(events: DataFrame) -> DataFrame:
    """Streaming half of
    ``operators.rollups.histogram_rollup_percentiles``: watermarked
    per-(event_type, hour, bin) fixed-bin counts.  Bin counts are
    losslessly mergeable (plain sums), so the serving layer appends
    each closed hour's partial histogram and answers any coarser grain
    — day, week — by summation, exactly like the batch operator's
    hour->day merge; state is #open-hours x #types x <=HIST_BINS rows,
    independent of input volume.  Data-independent bin breaks are what
    make this possible: no global min/max pre-pass, so the stream
    needs no second look at history."""
    from ..operators.rollups import HIST_BINS, HIST_LO, HIST_W

    b = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(HIST_LO)) / F.lit(HIST_W)),
            F.lit(0),
        ),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    return (
        events.filter(F.col("value").isNotNull())
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("h"), "event_type", "bin", "cnt"
        )
    )


def streaming_daily_value_histogram(telemetry: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.sketch.daily_value_histogram`` —
    the mergeable partial behind ``sliding_p95_histogram``: watermarked
    per-(metric, day, bucket) counts, appended once per closed day.
    Plain sums are losslessly mergeable, so a serving layer ingests
    these partials and answers ANY trailing-window quantile by
    re-merging sketches (``sketch.sliding_quantile_from_partials``)
    without rescanning facts; state is #open-days x #metrics x
    #buckets rows, independent of input volume.

    Timezone contract (same as streaming_table_fingerprint): the
    stream buckets by epoch-aligned UTC 1-day windows while the batch
    side groups by ``to_date(time)`` — they agree only under a UTC
    session, so this refuses to build under any other.
    """
    from pyspark.sql import SparkSession

    from ..operators.sketch import HIST_WIDTH

    active = SparkSession.getActiveSession()
    tz = active.conf.get("spark.sql.session.timeZone") if active else "UTC"
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            "streaming_daily_value_histogram requires a UTC session "
            f"timezone (got {tz!r}): its epoch-aligned 1-day windows "
            "must match the batch side's to_date(time) day boundaries"
        )
    b = F.expr(f"CAST(FLOOR(value_num / {HIST_WIDTH!r}) AS INT)")
    return (
        telemetry.filter(F.col("value_num").isNotNull())
        .withWatermark("time", "1 hour")
        .groupBy(F.window("time", "1 day"), F.col("metric"), b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "metric",
            F.col("window.start").cast("date").alias("day"),
            "bucket",
            "n",
        )
    )


def streaming_hour_quantile_partials(
    events: DataFrame, cap: int | None = None
) -> DataFrame:
    """Streaming twin of ``operators.rollups.hour_quantile_partials``
    — the mergeable ANY-quantile partial, appended once per closed
    hour: per (event_type, hour), the rank-sampled compression of the
    hour's sorted values (kept ranks {1, s+1, …} ∪ {n}, exact gap
    weights).  A serving layer ingests these ≤ cap+1-row partials and
    answers any quantile at any coarser grain by weight summation
    (``rollups.quantile_sketch_rollup``'s merge stage) without
    rescanning facts.

    The construction is a pure function of the hour's value MULTISET,
    so the emitted rows are bit-identical to the batch partial
    regardless of arrival order or micro-batching
    (tests/test_quantile_sketch.py pins batch ≡ stream).  The price is
    that the open hour's values sit in window state until the
    watermark closes it — the same rows the batch hour group reads,
    bounded by one hour of one event_type's traffic, and the knob a
    production deployment would trade for a KLL compactor stack
    (O(cap·log) state) at the cost of that bit-exactness.
    """
    from pyspark.sql import SparkSession

    from ..operators.rollups import QSK_CAP

    kk = cap or QSK_CAP
    active = SparkSession.getActiveSession()
    tz = active.conf.get("spark.sql.session.timeZone") if active else "UTC"
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            "streaming_hour_quantile_partials requires a UTC session "
            f"timezone (got {tz!r}): its epoch-aligned 1-hour windows "
            "must match the batch side's date_trunc('hour') boundaries"
        )
    agg = (
        events.filter(F.col("value").isNotNull())
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("value", "event_id"))
            ).alias("arr")
        )
    )
    # kept-point extraction as pure array arithmetic over the sorted
    # hour multiset — the same rank/stride/weight closed forms as the
    # batch partial, evaluated JVM-side (no Python on this path)
    kept = F.expr(
        "filter(transform(sequence(1, size(arr)), i -> named_struct("
        " 'value', arr[i - 1].value,"
        " 'w', CAST(CASE WHEN i = 1 THEN 1"
        f"      WHEN (i - 1) % ((size(arr) + {kk} - 1) DIV {kk}) = 0"
        f"      THEN (size(arr) + {kk} - 1) DIV {kk}"
        f"      ELSE (i - 1) % ((size(arr) + {kk} - 1) DIV {kk}) END"
        "       AS BIGINT),"
        " 'keep', (i - 1) %"
        f" ((size(arr) + {kk} - 1) DIV {kk}) = 0 OR i = size(arr)"
        ")), p -> p.keep)"
    )
    return (
        agg.select(
            "event_type",
            F.col("window.start").alias("h"),
            F.explode(kept).alias("p"),
        )
        .select(
            "event_type", "h", F.col("p.value").alias("value"),
            F.col("p.w").alias("w"),
        )
    )


def streaming_candlestick(
    telemetry: DataFrame, watermark: str = "1 minute"
) -> DataFrame:
    """Streaming twin of ``hyperfunctions.candlestick_agg``: hourly
    OHLC candles maintained incrementally.  Same mergeable-aggregate
    argument as :func:`streaming_m4_downsample`; the emitted candle
    KEEPS its open/close order keys, so a downstream consumer can roll
    closed hour candles up to coarser grains (``candlestick_merge``)
    without ever touching raw rows — continuous aggregate on the
    stream, hierarchical rollup in the lake.
    """
    key = F.concat(
        F.lpad(F.unix_micros(F.col("time")).cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return (
        telemetry.filter(F.col("value_num").isNotNull())
        .withWatermark("time", watermark)
        .groupBy(F.window("time", "1 hour"), F.col("metric"))
        .agg(
            F.min_by("value_num", key).alias("open_value"),
            F.max("value_num").alias("high_value"),
            F.min("value_num").alias("low_value"),
            F.max_by("value_num", key).alias("close_value"),
            F.min(key).alias("open_key"),
            F.max(key).alias("close_key"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col("window.start").alias("bucket"),
            "metric",
            "open_value",
            "high_value",
            "low_value",
            "close_value",
            "open_key",
            "close_key",
            "n_samples",
        )
    )


def streaming_table_fingerprint(events: DataFrame) -> DataFrame:
    """Watermarked per-day replication fingerprints on the ingest
    stream — the streaming half of operators/dq.table_fingerprint, and
    the reason that operator's buffers are all fixed-width BIGINTs:
    COUNT, the three 20-bit chunk sums, BIT_XOR and MIN/MAX are ALL
    incrementally maintainable, so each closed day emits the same
    checksum the batch verifier would compute — the sink side of a
    replication pipeline can fingerprint ITSELF as it ingests, with
    #open-days rows of state, and compare against the source's batch
    fingerprints with no second scan.

    Batch ≡ stream bit-for-bit on closed days
    (tests/test_streaming_fingerprint.py); the mod-2^60 recombination
    happens per emitted row, after the mergeable chunk sums.

    Timezone contract: this stream buckets by ``F.window('ts', '1
    day')`` — epoch-aligned UTC tumbling days — while the batch
    verifier groups by ``to_date(ts)``, which follows
    ``spark.sql.session.timeZone``.  The two agree ONLY under a UTC
    session (session.py pins it in RUNTIME_CONFS); a non-UTC session
    would place rows between local and UTC midnight in different days
    on the two paths, so this function refuses to build under one.
    """
    from pyspark.sql import SparkSession

    from ..operators.dq import _fp_canon_spark

    active = SparkSession.getActiveSession()
    tz = active.conf.get("spark.sql.session.timeZone") if active else "UTC"
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            "streaming_table_fingerprint requires a UTC session timezone "
            f"(got {tz!r}): its epoch-aligned 1-day windows must match "
            "the batch verifier's to_date(ts) day boundaries"
        )

    h60 = F.conv(
        F.substring(F.md5(_fp_canon_spark()), 1, 15), 16, 10
    ).cast("long")
    agged = (
        events.withColumn("h60", h60)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(f"SUM(h60 % {2**20})").alias("_s0"),
            F.expr(f"SUM((h60 DIV {2**20}) % {2**20})").alias("_s1"),
            F.expr(f"SUM(h60 DIV {2**40})").alias("_s2"),
            F.expr("bit_xor(h60)").alias("hash_xor"),
            F.min("h60").alias("hash_min"),
            F.max("h60").alias("hash_max"),
        )
    )
    total = (
        F.col("_s0") % F.lit(2**60)
        + (F.col("_s1") % F.lit(2**40)) * F.lit(2**20)
        + (F.col("_s2") % F.lit(2**20)) * F.lit(2**40)
    ) % F.lit(2**60)
    return agged.select(
        F.col("window.start").cast("date").alias("day"),
        "n_rows",
        total.alias("hash_sum"),
        "hash_xor",
        "hash_min",
        "hash_max",
    )

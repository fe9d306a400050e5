"""TimescaleDB-style hyperfunctions over the telemetry view.

The reference stores telemetry in TimescaleDB (database/init.sql), whose
analytics toolkit's most-used hyperfunctions beyond plain rollups are
time-weighted aggregates and gap-filling.  Both re-expressed
Spark-first here:

* ``time_weighted_avg`` — LOCF (last-observation-carried-forward)
  time-weighted mean per metric: each sample holds its value until the
  next sample, so its weight is the gap to the successor.  The honest
  average for irregularly-sampled OPC-UA telemetry, where plain AVG
  over-weights bursts.
* ``time_bucket_gapfill`` + LOCF fill — minute buckets materialized for
  EVERY minute of each metric's span, with empty buckets carrying the
  last seen value (marked ``is_gap``) — the dashboard-friendly dense
  series (timescale's time_bucket_gapfill + locf()).

Scale shapes:
* time-weighted avg / counter_agg / uptime_agg: metric is a
  LOW-CARDINALITY key (~tens of values on real telemetry), so a bare
  ``Window.partitionBy("metric")`` over full history would funnel each
  metric's entire 100 TB share through ONE task's sort.  All three are
  therefore two-pass de-skewed with the (metric, day) composite-key
  pattern proven in dashboard.q_progress_clamp: the sequential window
  (lead/lag/cumsum) runs inside (metric, day) partitions — day is a
  prefix of the sort key, so day groups are contiguous in the global
  (time, event_id) order — and the cross-day carry (next day's first
  sample time / previous day's last sample value / per-day flag
  offsets) comes from a per-(metric, day) boundary table that is tiny
  (#metrics x #days rows) and broadcast back.  Results are
  bit-identical to the single-window formulation (same exact integer
  gaps, same decimal sums), so the oracles are unchanged; the per-task
  sort is now bounded by one key's single day at any scale.
* gapfill: the bucket spine is #metrics x #minutes-of-span rows —
  bounded by wall-clock span, NOT by data volume; the LOCF window is
  per metric (documented low-cardinality key, same contract as
  progress_clamp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .ingest import TELEMETRY_SQL, telemetry

_DEC = "decimal(38,6)"


def time_weighted_avg(tel: DataFrame) -> DataFrame:
    """LOCF time-weighted average of ``value_num`` per metric.

    weight_i = micros(next sample's time) - micros(time): exact BIGINT.
    The final sample of each metric has no successor — its holding
    period is unknown, so it contributes no weight (standard LOCF
    endpoint rule).  The weighted sum is ``(value * dt)`` cast to
    DECIMAL(38,6) then summed — associative, partition-order-free —
    and both final casts to DOUBLE divide as identical doubles on
    every engine.

    De-skewed two-pass (see module docstring): ``lead(time)`` runs
    inside (metric, day) windows; each day's LAST sample takes its
    successor time from the next day-with-data's first sample, carried
    in a broadcast per-(metric, day) boundary table.  The dt values —
    and therefore the decimal weighted sum — are bit-identical to a
    full-history lead.
    """
    samples = (
        tel.filter(F.col("value_num").isNotNull())
        .select("metric", "time", "event_id", "value_num")
        .withColumn("_day", F.to_date("time"))
    )
    w_local = Window.partitionBy("metric", "_day").orderBy("time", "event_id")
    local = samples.withColumn("_next_local", F.lead("time").over(w_local))
    # tiny boundary frame: each (metric, day)'s first sample time, and
    # via lead over day order, the NEXT day-with-data's first time
    w_days = Window.partitionBy("metric").orderBy("_day")
    bounds = (
        samples.groupBy("metric", "_day")
        .agg(F.min("time").alias("_first"))
        .withColumn("_next_day_first", F.lead("_first").over(w_days))
        .select("metric", "_day", "_next_day_first")
    )
    samples = (
        local.join(F.broadcast(bounds), ["metric", "_day"])
        .withColumn(
            "dt",
            F.unix_micros(
                F.coalesce("_next_local", "_next_day_first")
            )
            - F.unix_micros(F.col("time")),
        )
        .filter(F.col("dt").isNotNull())
    )
    # try_divide: a metric whose samples all share one timestamp has
    # total weight 0 — NULL average, not an ANSI divide-by-zero error
    # (found by tests/test_deskew_properties.py)
    return samples.groupBy("metric").agg(
        F.try_divide(
            F.sum(
                (F.col("value_num") * F.col("dt").cast("double")).cast(_DEC)
            ).cast("double"),
            F.sum("dt").cast("double"),
        ).alias("time_weighted_avg"),
        F.sum("dt").alias("total_weight_micros"),
        F.count(F.lit(1)).alias("n_weighted_samples"),
    )


def time_bucket_gapfill(tel: DataFrame) -> DataFrame:
    """Dense minute series per metric with LOCF fill.

    Spine: every minute from each metric's first to last sample
    (inclusive) — sequence + explode, bounded by time span.  Observed
    buckets carry the decimal-exact minute average; empty buckets
    carry the last observed average (``is_gap`` = true).  Leading
    buckets before the first observation cannot exist by
    construction (the spine starts at the first sample's minute).
    """
    samples = tel.filter(F.col("value_num").isNotNull())
    minute = F.date_trunc("minute", F.col("time"))
    observed = (
        samples.groupBy(F.col("metric"), minute.alias("bucket"))
        .agg(
            (
                F.sum(F.col("value_num").cast(_DEC)).cast("double")
                / F.count("value_num")
            ).alias("avg_value")
        )
    )
    spine = (
        samples.groupBy("metric")
        .agg(
            F.date_trunc("minute", F.min("time")).alias("mn"),
            F.date_trunc("minute", F.max("time")).alias("mx"),
        )
        .select(
            "metric",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 minute"))
            ).alias("bucket"),
        )
    )
    w = Window.partitionBy("metric").orderBy("bucket")
    joined = spine.join(observed, ["metric", "bucket"], "left")
    return joined.select(
        "metric",
        "bucket",
        F.last("avg_value", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("avg_value"),
        F.col("avg_value").isNull().alias("is_gap"),
    )


def gapfill_interpolate(tel: DataFrame) -> DataFrame:
    """Dense minute series with LINEAR interpolation — timescale's
    ``time_bucket_gapfill`` + ``interpolate()`` companion to the LOCF
    variant above: a gap bucket gets the straight line between the
    nearest observed minute averages on either side.

    Two windows per metric (last-non-null back, first-non-null
    forward) over the same spine; the interpolation weight is a ratio
    of exact integer second offsets, so the value expression is pure
    IEEE arithmetic in pinned order (no libm) — bit-identical
    cross-engine with no rounding contract.  Leading/trailing gaps
    cannot exist (the spine spans first..last sample), so every gap
    has both anchors.
    """
    # same observed/spine frames as the LOCF variant (kept inline so
    # each operator stays a standalone plan)
    samples = tel.filter(F.col("value_num").isNotNull())
    minute = F.date_trunc("minute", F.col("time"))
    observed = samples.groupBy(F.col("metric"), minute.alias("bucket")).agg(
        (
            F.sum(F.col("value_num").cast(_DEC)).cast("double")
            / F.count("value_num")
        ).alias("avg_value")
    )
    spine = (
        samples.groupBy("metric")
        .agg(
            F.date_trunc("minute", F.min("time")).alias("mn"),
            F.date_trunc("minute", F.max("time")).alias("mx"),
        )
        .select(
            "metric",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 minute"))
            ).alias("bucket"),
        )
    )
    joined = spine.join(observed, ["metric", "bucket"], "left")
    w = Window.partitionBy("metric").orderBy("bucket")
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    # forward anchors via a REVERSED-order running frame (round 11):
    # the natural spelling — first(ignorenulls) over
    # rowsBetween(0, unboundedFollowing) — hits Spark's
    # UnboundedFollowing frame processor, which re-scans the rest of
    # the partition for EVERY row: O(rows²) per metric.  At sf0.01
    # that was ~195 s for a 172k-row spine (~34k rows/metric); the
    # descending unboundedPreceding frame computes the identical
    # "nearest observed at-or-after" incrementally in O(rows).
    rev = (
        Window.partitionBy("metric")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_bucket = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    prev_v = F.last("avg_value", ignorenulls=True).over(back)
    prev_t = F.last(obs_bucket, ignorenulls=True).over(back)
    next_v = F.last("avg_value", ignorenulls=True).over(rev)
    next_t = F.last(obs_bucket, ignorenulls=True).over(rev)
    dt = F.unix_timestamp(F.col("bucket")) - F.unix_timestamp(prev_t)
    dT = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    interp = prev_v + (next_v - prev_v) * (
        dt.cast("double") / dT.cast("double")
    )
    return joined.select(
        "metric",
        "bucket",
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .otherwise(interp)
        .alias("value"),
        F.col("avg_value").isNull().alias("is_gap"),
    )


def counter_agg(tel: DataFrame) -> DataFrame:
    """Resets-aware counter aggregate (timescale ``counter_agg`` /
    ``delta``): OPC-UA production counters are monotonic but reset on
    machine restart; the true delta over a window is the sum of
    positive sample-to-sample increases, with drops treated as resets
    (the post-reset value counts fully, as the counter restarted from
    0 — Prometheus/Timescale extrapolation-free rule).

    Deltas of doubles are the same doubles on every engine; the
    decimal-cast sum keeps partition order out of the result.
    rate = delta / elapsed wall-clock (exact micros).

    De-skewed two-pass (see module docstring): ``lag(value_num)`` runs
    inside (metric, day) windows; each day's FIRST sample takes its
    predecessor value from the previous day-with-data's last sample
    (max_by on a (time, event_id) STRUCT ordering key — structs
    compare field-wise, so unlike the zero-padded-string spelling it
    stays correct for negative pre-1970 micros or event_ids), carried
    in a broadcast boundary table.  prev values are bit-identical to a
    full-history lag.
    """
    samples = (
        tel.filter(F.col("value_num").isNotNull())
        .select("metric", "time", "event_id", "value_num")
        .withColumn("_day", F.to_date("time"))
    )
    w_local = Window.partitionBy("metric", "_day").orderBy("time", "event_id")
    local = samples.withColumn("_prev_local", F.lag("value_num").over(w_local))
    _okey = F.struct(F.col("time"), F.col("event_id"))
    w_days = Window.partitionBy("metric").orderBy("_day")
    bounds = (
        samples.groupBy("metric", "_day")
        .agg(F.max_by("value_num", _okey).alias("_last"))
        .withColumn("_prev_day_last", F.lag("_last").over(w_days))
        .select("metric", "_day", "_prev_day_last")
    )
    samples = local.join(F.broadcast(bounds), ["metric", "_day"]).withColumn(
        "prev", F.coalesce("_prev_local", "_prev_day_last")
    )
    inc = F.when(
        F.col("prev").isNull(), F.lit(None).cast("double")
    ).when(
        F.col("value_num") >= F.col("prev"),
        F.col("value_num") - F.col("prev"),
    ).otherwise(F.col("value_num"))
    return samples.groupBy("metric").agg(
        F.sum(inc.cast(_DEC)).cast("double").alias("counter_delta"),
        F.count(F.when(F.col("value_num") < F.col("prev"), 1)).alias(
            "n_resets"
        ),
        F.try_divide(
            F.sum(inc.cast(_DEC)).cast("double"),
            (
                F.unix_micros(F.max("time"))
                - F.unix_micros(F.min("time"))
            ).cast("double")
            / 1e6,
        ).alias("rate_per_sec"),
    )


def trend_slope(tel: DataFrame) -> DataFrame:
    """Per-metric linear trend (timescale ``stats_agg`` -> slope/
    intercept): least-squares fit of value against time — the drift
    detector for slowly-degrading sensors.

    Determinism plan: x is re-centered to micros-since-first-sample
    (exact BIGINT, bounded by the metric's span, so ``x`` and ``x·x``
    round-trip double multiplication identically everywhere); the
    per-row products cast to DECIMAL(38,6) before summing (the repo's
    associativity contract); the closed-form slope then evaluates in
    one pinned textual order on both engines.  The raw-moment formula
    is catastrophically cancelling (n·Σxy − Σx·Σy subtracts ~equal
    1e20s), which amplifies the one place engines disagree — the
    DECIMAL→DOUBLE conversion of huge sums is correctly-rounded in
    the JVM but double-rounded for int128 in other engines — so the
    published slope/intercept are rounded to DECIMAL(38,12) and
    re-cast (the tfidf ulp-collapse contract).  Slope is reported per
    SECOND (per-micro slope × 1e6).

    De-skewed (round 5): the per-metric first-sample micros comes from
    a ``groupBy`` aggregate broadcast-joined back — a map-side-
    combinable shuffle over #metrics rows — instead of an unordered
    ``Window.partitionBy("metric")`` min, which funnels each metric's
    FULL history through one task at 100 TB.  ``x`` is the identical
    BIGINT difference, so every downstream sum is bit-identical.
    """
    base = tel.filter(F.col("value_num").isNotNull()).select(
        "metric", "time", "value_num"
    )
    t0 = base.groupBy("metric").agg(
        F.min(F.unix_micros(F.col("time"))).alias("_t0_us")
    )
    samples = base.join(F.broadcast(t0), "metric").withColumn(
        "x", (F.unix_micros(F.col("time")) - F.col("_t0_us")).cast("double")
    )
    sx = F.sum(F.col("x").cast(_DEC)).cast("double")
    sy = F.sum(F.col("value_num").cast(_DEC)).cast("double")
    sxy = F.sum((F.col("x") * F.col("value_num")).cast(_DEC)).cast("double")
    sxx = F.sum((F.col("x") * F.col("x")).cast(_DEC)).cast("double")
    n = F.count(F.lit(1)).cast("double")
    # try_divide: a metric with a single sample (or all samples at one
    # timestamp) has zero x-variance — slope/intercept are undefined
    # (NULL), not an ANSI divide-by-zero error
    slope_micro = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    return samples.groupBy("metric").agg(
        (slope_micro * F.lit(1e6))
        .cast("decimal(38,12)")
        .cast("double")
        .alias("slope_per_sec"),
        ((sy - slope_micro * sx) / n)
        .cast("decimal(38,12)")
        .cast("double")
        .alias("intercept"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def m4_downsample(tel: DataFrame) -> DataFrame:
    """M4 downsampling per (metric, minute bucket): first/last/min/max
    of the value — the standard error-free line-chart reduction (a
    pixel column only ever renders those four points), and what a
    Grafana panel should pull instead of raw rows at scale.

    first/last are by (time, event_id) order via min_by/max_by on a
    zero-padded string composite key — lexicographic order over
    fixed-width digits equals the (time, event_id) order, and a
    VARCHAR ordering key is the one form every engine's arg_min/
    arg_max agrees on (DuckDB rejects struct keys).  One shuffle,
    map-side combinable.
    """
    minute = F.date_trunc("minute", F.col("time"))
    # PRECONDITION: lexicographic order over the zero-padded digits
    # equals numeric order only for NON-NEGATIVE micros and event_ids
    # (post-1970 timestamps).  This key is shared with the DuckDB
    # oracle (which rejects struct arg_min/arg_max keys), so it stays
    # a VARCHAR; the Spark-only boundary carries in counter_agg /
    # state_durations use struct keys and have no such precondition.
    key = F.concat(
        F.lpad(F.unix_micros(F.col("time")).cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return (
        tel.filter(F.col("value_num").isNotNull())
        .groupBy(F.col("metric"), minute.alias("bucket"))
        .agg(
            F.min_by("value_num", key).alias("first_value"),
            F.max_by("value_num", key).alias("last_value"),
            F.min("value_num").alias("min_value"),
            F.max("value_num").alias("max_value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


HEARTBEAT_TOLERANCE_SEC = 120


def uptime_agg(
    tel: DataFrame, tolerance_sec: int = HEARTBEAT_TOLERANCE_SEC
) -> DataFrame:
    """Heartbeat/uptime aggregate (timescale ``heartbeat_agg``): treat
    each sample as a liveness ping; gaps longer than ``tolerance_sec``
    split live intervals, and uptime is the summed span of the merged
    intervals.  Exactly the reference's "is the machine running"
    question computed from telemetry itself.

    Same gap-split cumsum shape as sessionize: lag + boundary flag +
    running interval id, then two exact integer aggregations (span
    sums in micros).

    De-skewed two-pass (see module docstring): the lag and the
    interval-id cumsum both run inside (metric, day) windows.  The
    first row of each day takes its predecessor time from the previous
    day-with-data's last sample (broadcast boundary table), so the
    boundary flags are bit-identical to the full-history lag; the
    global interval id is the local per-day cumsum plus a per-(metric,
    day) offset — the exclusive running total of each previous day's
    flag count, computed on the tiny (#metrics x #days) day table and
    broadcast back.  Interval ids (and so spans and counts) are the
    same integers the single-window cumsum assigns.
    """
    pings = tel.select("metric", "time", "event_id").withColumn(
        "_day", F.to_date("time")
    )
    w_local = Window.partitionBy("metric", "_day").orderBy("time", "event_id")
    w_days = Window.partitionBy("metric").orderBy("_day")
    bounds = (
        pings.groupBy("metric", "_day")
        .agg(F.max("time").alias("_last"))
        .withColumn("_prev_day_last", F.lag("_last").over(w_days))
        .select("metric", "_day", "_prev_day_last")
    )
    prev_time = F.coalesce(
        F.lag("time").over(w_local), F.col("_prev_day_last")
    )
    gap = F.unix_micros(F.col("time")) - F.unix_micros(prev_time)
    new_interval = F.when(
        gap.isNull() | (gap > tolerance_sec * 1_000_000), 1
    ).otherwise(0)
    flagged = (
        pings.join(F.broadcast(bounds), ["metric", "_day"])
        .withColumn("_flag", new_interval)
        .withColumn(
            "_local_id",
            F.sum("_flag").over(
                w_local.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    day_flags = flagged.groupBy("metric", "_day").agg(
        F.sum("_flag").alias("_nflags")
    )
    offsets = day_flags.select(
        "metric",
        "_day",
        F.coalesce(
            F.sum("_nflags").over(
                w_days.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    flagged = flagged.join(F.broadcast(offsets), ["metric", "_day"]).select(
        "metric",
        "time",
        (F.col("_off") + F.col("_local_id")).alias("interval_id"),
    )
    intervals = flagged.groupBy("metric", "interval_id").agg(
        (
            F.unix_micros(F.max("time")) - F.unix_micros(F.min("time"))
        ).alias("span_micros")
    )
    return intervals.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("span_micros").cast("bigint").alias("uptime_micros"),
    )


def state_durations(tel: DataFrame) -> DataFrame:
    """State aggregate (timescale ``state_agg`` / ``duration_in``):
    per operator, each sample's metric is the machine's current state
    and holds until the next sample (LOCF), so time-in-state is the
    sum of holding gaps and ``n_entries`` counts transitions INTO the
    state — "how long was each machine in each mode" computed from
    telemetry itself.

    Same (operator, day) two-pass de-skew as the other sequential
    hyperfunctions (see module docstring): lead(time) and lag(state)
    run inside contiguous per-day windows; day boundaries carry the
    next day's first sample time and the previous day's last state
    from one broadcast per-(operator, day) table.  The global last
    sample holds for an unknown period and contributes no duration
    (LOCF endpoint rule); all spans are exact BIGINT micros.
    """
    rows = (
        tel.filter(F.col("operator").isNotNull())
        .select("operator", "metric", "time", "event_id")
        .withColumn("_day", F.to_date("time"))
    )
    w_local = Window.partitionBy("operator", "_day").orderBy(
        "time", "event_id"
    )
    w_days = Window.partitionBy("operator").orderBy("_day")
    # struct ordering key: field-wise comparison handles negative
    # micros/event_ids, unlike the zero-padded-string spelling
    _okey = F.struct(F.col("time"), F.col("event_id"))
    bounds = (
        rows.groupBy("operator", "_day")
        .agg(
            F.min("time").alias("_first"),
            F.max_by("metric", _okey).alias("_last_state"),
        )
        .select(
            "operator",
            "_day",
            F.lead("_first").over(w_days).alias("_next_day_first"),
            F.lag("_last_state").over(w_days).alias("_prev_day_state"),
        )
    )
    j = rows.join(F.broadcast(bounds), ["operator", "_day"])
    dt = F.unix_micros(
        F.coalesce(F.lead("time").over(w_local), F.col("_next_day_first"))
    ) - F.unix_micros(F.col("time"))
    prev_state = F.coalesce(
        F.lag("metric").over(w_local), F.col("_prev_day_state")
    )
    entered = F.when(
        prev_state.isNull() | (prev_state != F.col("metric")), 1
    ).otherwise(0)
    return (
        j.select(
            "operator",
            F.col("metric").alias("state"),
            dt.alias("dt"),
            entered.alias("entered"),
        )
        .groupBy("operator", "state")
        .agg(
            F.coalesce(F.sum("dt"), F.lit(0))
            .cast("bigint")
            .alias("duration_micros"),
            F.sum("entered").cast("bigint").alias("n_entries"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def _order_key() -> Column:
    """The shared (time, event_id) VARCHAR ordering key (see
    m4_downsample for the non-negativity precondition and why it
    stays a VARCHAR: the DuckDB oracle's arg_min/arg_max rejects
    struct keys)."""
    return F.concat(
        F.lpad(F.unix_micros(F.col("time")).cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )


def candlestick_agg(tel: DataFrame) -> DataFrame:
    """Per-(metric, hour) OHLC candlestick partials — the analytics-
    toolkit ``candlestick_agg`` analog for sensor telemetry (same
    continuous-aggregate family as database/init.sql:37-48).

    Beyond m4_downsample, each partial carries its own open/close
    ORDER KEYS, which is what makes the candlestick a true monoid:
    two candles merge by keeping the open at the smaller open_key and
    the close at the larger close_key (and min/max/sum for the rest),
    so hour candles roll up to any coarser grain without rescanning
    raw rows — the serving-layer shape for OHLC at 100 TB.  One
    map-side-combinable shuffle on (metric, hour).
    """
    key = _order_key()
    return (
        tel.filter(F.col("value_num").isNotNull())
        .groupBy(F.col("metric"), F.date_trunc("hour", F.col("time")).alias("bucket"))
        .agg(
            F.min_by("value_num", key).alias("open_value"),
            F.max("value_num").alias("high_value"),
            F.min("value_num").alias("low_value"),
            F.max_by("value_num", key).alias("close_value"),
            F.min(key).alias("open_key"),
            F.max(key).alias("close_key"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def candlestick_merge(tel: DataFrame) -> DataFrame:
    """Hierarchical OHLC rollup: DAY candles produced by MERGING the
    hour partials from :func:`candlestick_agg` — never re-reading raw
    rows — while the DuckDB oracle computes the day candles directly
    from raw telemetry.  Hash-parity therefore proves the candlestick
    merge identity end-to-end (the hll_rollup_merge contract shape,
    exact instead of sketched).  DATE (not midnight timestamp) for
    the day bucket, per the engines' date_trunc('day') asymmetry.
    """
    hours = candlestick_agg(tel)
    return (
        hours.groupBy(F.col("metric"), F.to_date(F.col("bucket")).alias("day"))
        .agg(
            F.min_by("open_value", F.col("open_key")).alias("open_value"),
            F.max("high_value").alias("high_value"),
            F.min("low_value").alias("low_value"),
            F.max_by("close_value", F.col("close_key")).alias("close_value"),
            F.sum("n_samples").alias("n_samples"),
        )
    )


LTTB_N_OUT = 50


def _global_rank(samples: DataFrame) -> DataFrame:
    """Per-metric global (time, event_id) rank WITHOUT a full-history
    window: row_number inside (metric, day) partitions + a broadcast
    per-day offset table (the module's standard two-pass de-skew).
    Adds columns ``rk`` (1-based global rank) and ``n`` (metric row
    count)."""
    s = samples.withColumn("_day", F.to_date("time"))
    w_local = Window.partitionBy("metric", "_day").orderBy("time", "event_id")
    w_days = (
        Window.partitionBy("metric")
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    day_counts = s.groupBy("metric", "_day").agg(F.count(F.lit(1)).alias("_c"))
    offsets = day_counts.select(
        "metric",
        "_day",
        F.coalesce(F.sum("_c").over(w_days), F.lit(0)).alias("_off"),
    )
    totals = s.groupBy("metric").agg(F.count(F.lit(1)).alias("n"))
    return (
        s.withColumn("_lrk", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["metric", "_day"])
        .join(F.broadcast(totals), "metric")
        .withColumn("rk", F.col("_lrk") + F.col("_off"))
        .drop("_lrk", "_off", "_day")
    )


def lttb_downsample(tel: DataFrame, n_out: int = LTTB_N_OUT) -> DataFrame:
    """Largest-Triangle downsampling per metric to ~``n_out`` points —
    the visualization hyperfunction (toolkit ``lttb``): keep the first
    and last samples, split the middle into n_out-2 equal-count
    buckets, and from each bucket keep the point forming the largest
    triangle with its neighbors.

    PARALLEL-ANCHOR variant: strict LTTB anchors each bucket's
    triangle on the PREVIOUS BUCKET'S SELECTED point — a chain that
    serializes the whole series through one task at any scale.  Here
    the anchor is the previous bucket's AVERAGE (the reference point
    stays the next bucket's average, as in strict LTTB), which
    decouples every bucket: selection becomes one shuffle-free argmax
    per bucket.  The POINT IDENTITIES therefore differ from the
    sequential algorithm (anchor-sensitive argmaxes flip), but the
    thing a downsample is FOR — polyline reconstruction fidelity — is
    comparable or better: tests/test_hyperfunctions.py pins the
    variant's max interpolation error at <= the strict algorithm's
    x1.5 on both a smooth and a noisy series (measured: ~0.8x on the
    smooth one).  End buckets are singletons ({first}, {last}), so
    the extreme picks strict LTTB guarantees are preserved exactly.

    Scale: the only windows are the (metric, day)-bounded rank pass;
    bucket stats and the per-bucket max are map-side-combinable
    groupBys broadcast back (#metrics x n_out rows).  Selection uses
    MAX(area) + equality join + min-okey tiebreak — area is pure IEEE
    double arithmetic in pinned order on exact inputs (integer micros
    sums, DECIMAL value sums), so the oracle's argmax agrees
    bit-for-bit with no rounding contract.
    """
    b_mid = n_out - 2
    samples = tel.filter(F.col("value_num").isNotNull()).select(
        "metric", "time", "event_id", "value_num"
    )
    ranked = _global_rank(samples).withColumn(
        "x_us", F.unix_micros(F.col("time"))
    )
    # small series pass through whole (strict LTTB semantics)
    small = ranked.filter(F.col("n") <= n_out).select(
        "metric",
        (F.col("rk") - 1).cast("int").alias("bucket_idx"),
        "time",
        F.col("value_num").alias("value"),
    )
    big = ranked.filter(F.col("n") > n_out)
    # bucket 0 = {first}, buckets 1..b_mid equal-count middle,
    # bucket b_mid+1 = {last}
    idx = (
        F.when(F.col("rk") == 1, F.lit(0))
        .when(F.col("rk") == F.col("n"), F.lit(b_mid + 1))
        .otherwise(
            F.expr(f"CAST(1 + (((rk - 2) * {b_mid}) div (n - 2)) AS INT)")
        )
    )
    pts = big.withColumn("idx", idx)
    bavg = pts.groupBy("metric", "idx").agg(
        F.expr(
            "CAST(SUM(CAST(x_us AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)"
        ).alias("ax"),
        F.expr(
            "CAST(SUM(CAST(value_num AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)"
        ).alias("ay"),
    )
    mids = (
        pts.filter((F.col("idx") >= 1) & (F.col("idx") <= b_mid))
        .join(
            F.broadcast(
                bavg.select(
                    "metric",
                    (F.col("idx") + 1).alias("idx"),
                    F.col("ax").alias("xa"),
                    F.col("ay").alias("ya"),
                )
            ),
            ["metric", "idx"],
        )
        .join(
            F.broadcast(
                bavg.select(
                    "metric",
                    (F.col("idx") - 1).alias("idx"),
                    F.col("ax").alias("xn"),
                    F.col("ay").alias("yn"),
                )
            ),
            ["metric", "idx"],
        )
        .withColumn(
            "area",
            F.expr(
                "abs((xa - xn) * (value_num - ya)"
                " - (xa - CAST(x_us AS DOUBLE)) * (yn - ya))"
            ),
        )
        .withColumn("okey", _order_key())
    )
    amax = mids.groupBy("metric", "idx").agg(F.max("area").alias("amax"))
    selected = (
        mids.join(F.broadcast(amax), ["metric", "idx"])
        .filter(F.col("area") == F.col("amax"))
        .groupBy("metric", "idx")
        .agg(
            F.min_by("time", F.col("okey")).alias("time"),
            F.min_by("value_num", F.col("okey")).alias("value"),
        )
        .select(
            "metric", F.col("idx").cast("int").alias("bucket_idx"), "time", "value"
        )
    )
    ends = pts.filter(
        (F.col("rk") == 1) | (F.col("rk") == F.col("n"))
    ).select(
        "metric",
        F.col("idx").cast("int").alias("bucket_idx"),
        "time",
        F.col("value_num").alias("value"),
    )
    return small.unionByName(ends).unionByName(selected)


#: Bucket width for the TIME-bucketed LTTB variant (the streamable
#: form: bucket membership is a pure function of the row, unlike the
#: equal-count buckets above, whose index needs the final series
#: length).
LTTB_TB_BUCKET_SEC = 3600


def lttb_time_bucketed(
    tel: DataFrame, bucket_sec: int = LTTB_TB_BUCKET_SEC
) -> DataFrame:
    """Largest-Triangle downsampling over fixed TIME buckets — one
    representative point per (metric, hour): the anchor is the
    nearest PRECEDING non-empty bucket's average and the reference
    the nearest FOLLOWING one's (the parallel-anchor scheme of
    :func:`lttb_downsample`, robust to gap hours); a metric's first
    bucket keeps its first sample and its last bucket its last sample
    (strict LTTB's singleton end buckets).

    This is the STREAMABLE spelling: count buckets need the final
    series length, time buckets don't, so per-bucket (sum, count,
    points) state closes monotonically under a watermark —
    ``streaming.hyperfunctions.lttb_stream`` is the twin, emitting a
    bucket the moment its successor closes (batch ≡ stream on every
    emitted bucket, pinned by tests/test_streaming_hyperfunctions).

    Scale: the raw scan collapses to per-(metric, bucket) partials in
    one map-side-combinable shuffle; neighbor averages come from lag/
    lead over the BUCKET SPINE (#metrics x #hours rows — rollup-sized,
    the module's standard spine window); selection is MAX(area) +
    equality + min-okey tiebreak, all on exact inputs (integer micros
    sums, DECIMAL(28,6) value sums), so the DuckDB oracle's argmax
    agrees bit-for-bit.
    """
    step = bucket_sec * 1_000_000
    pts = (
        tel.filter(F.col("value_num").isNotNull())
        .select("metric", "time", "event_id", "value_num")
        .withColumn("x_us", F.unix_micros(F.col("time")))
        .withColumn("bkt", F.expr(f"unix_micros(time) DIV {step}"))
    )
    bavg = pts.groupBy("metric", "bkt").agg(
        F.expr(
            "CAST(SUM(CAST(x_us AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)"
        ).alias("ax"),
        F.expr(
            "CAST(SUM(CAST(value_num AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)"
        ).alias("ay"),
    )
    w = Window.partitionBy("metric").orderBy("bkt")
    nb = bavg.select(
        "metric",
        "bkt",
        F.lag("ax").over(w).alias("xa"),
        F.lag("ay").over(w).alias("ya"),
        F.lead("ax").over(w).alias("xn"),
        F.lead("ay").over(w).alias("yn"),
    )
    joined = pts.join(F.broadcast(nb), ["metric", "bkt"]).withColumn(
        "okey", _order_key()
    )
    mids = joined.filter(
        F.col("xa").isNotNull() & F.col("xn").isNotNull()
    ).withColumn(
        "area",
        F.expr(
            "abs((xa - xn) * (value_num - ya)"
            " - (xa - CAST(x_us AS DOUBLE)) * (yn - ya))"
        ),
    )
    amax = mids.groupBy("metric", "bkt").agg(F.max("area").alias("amax"))
    selected = (
        mids.join(F.broadcast(amax), ["metric", "bkt"])
        .filter(F.col("area") == F.col("amax"))
        .groupBy("metric", "bkt")
        .agg(
            F.min_by("time", F.col("okey")).alias("time"),
            F.min_by("value_num", F.col("okey")).alias("value"),
        )
    )
    firsts = (
        joined.filter(F.col("xa").isNull())
        .groupBy("metric", "bkt")
        .agg(
            F.min_by("time", F.col("okey")).alias("time"),
            F.min_by("value_num", F.col("okey")).alias("value"),
        )
    )
    lasts = (
        joined.filter(F.col("xn").isNull())
        .groupBy("metric", "bkt")
        .agg(
            F.max_by("time", F.col("okey")).alias("time"),
            F.max_by("value_num", F.col("okey")).alias("value"),
        )
    )
    return (
        selected.unionByName(firsts)
        .unionByName(lasts)
        .distinct()  # a single-bucket metric's first point == last point
        .select(
            "metric",
            F.timestamp_seconds(F.col("bkt") * bucket_sec).alias("bucket"),
            "time",
            "value",
        )
    )


def metric_pair_correlation(tel: DataFrame, grain: str = "hour") -> DataFrame:
    """Pearson correlation of per-minute activity between every metric
    pair — the 2-D ``stats_agg`` analog: which sensors move together
    (hydration-dashboard material the reference computes client-side,
    per panel pair).

    Semantics: correlate the aligned per-(metric, bucket) SUMS over
    buckets where BOTH metrics have samples (inner alignment).  Hour
    grain by default — minute buckets on the sparse driver corpus
    align too rarely to be meaningful; at production densities pass
    ``grain="minute"``.

    Scale + exactness plan: the raw scan collapses to the minute
    rollup FIRST (one map-side-combinable shuffle — the correlation
    never touches raw rows again, so the pairwise stage runs on
    #buckets x #metrics rows, rollup-sized at any corpus size).  Each
    bucket sum is integer-scaled to micro-units (DECIMAL(28,6) sum x
    1e6 -> BIGINT, exact), the pair join replicates the rollup only
    #metrics times, and every Pearson moment accumulates in EXACT
    integer arithmetic (DECIMAL(38,0) here = HUGEINT in the oracle —
    products reach ~5e23, sums ~5e27, both inside 38 digits/int128).
    No float->decimal cast ever touches the sum path, dodging the
    repr-vs-exact cast divergence entirely; the closed form then
    evaluates in pinned double order and ulp-collapses at
    DECIMAL(18,9).  Correlation is scale-invariant, so micro-unit
    sums give the same r as the real-valued means... (up to the 1e-6
    quantization of the inputs, applied identically on both engines).
    """
    b = (
        tel.filter(F.col("value_num").isNotNull())
        .groupBy(
            F.col("metric"), F.date_trunc(grain, F.col("time")).alias("bucket")
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(value_num AS DECIMAL(28,6))) * 1000000 AS BIGINT)"
            ).alias("s6")
        )
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = (
        a.join(c, "bucket")
        .where(F.expr("a.metric < b.metric"))
        .select(
            F.col("a.metric").alias("metric_a"),
            F.col("b.metric").alias("metric_b"),
            F.col("a.s6").alias("x"),
            F.col("b.s6").alias("y"),
        )
    )
    dec = "DECIMAL(38,0)"
    agg = pairs.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"CAST(SUM(CAST(x AS {dec})) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM(CAST(y AS {dec})) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x AS {dec}) * y) AS DOUBLE)").alias("sxy"),
        F.expr(f"CAST(SUM(CAST(x AS {dec}) * x) AS DOUBLE)").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(y AS {dec}) * y) AS DOUBLE)").alias("syy"),
    )
    return agg.selectExpr(
        "metric_a",
        "metric_b",
        "n AS n_buckets",
        # try_divide: a constant series has zero variance -> NULL r
        "CAST(CAST(try_divide(n * sxy - sx * sy,"
        " sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        " AS DECIMAL(18,9)) AS DOUBLE) AS corr_value",
    )


LEADLAG_MAX = 3
_GRAIN_US = {"minute": 60_000_000, "hour": 3_600_000_000}


def lead_lag_correlation(
    tel: DataFrame, grain: str = "hour", max_lag: int = LEADLAG_MAX
) -> DataFrame:
    """Lagged Pearson profile between every metric pair: ``corr(x_t,
    y_{t+lag})`` for lag in [-max_lag, +max_lag] buckets — the lead-lag
    miner on top of :func:`metric_pair_correlation` (which is this
    operator's lag=0 slice).  A peak at positive lag means metric_a
    LEADS metric_b by that many buckets: the "which sensor moves
    first" question behind cascade/root-cause triage, which a plain
    correlation matrix cannot answer.

    Same scale + exactness contract as the unlagged operator: raw
    scan -> rollup-sized bucket table once; the lag spine (2*max_lag+1
    rows) broadcast-replicates the SMALL rollup, never the raw scan;
    the shifted equi-join runs on integer bucket micros; every moment
    accumulates in exact integer arithmetic per (pair, lag); ulp-
    collapse at DECIMAL(18,9).
    """
    step_us = _GRAIN_US[grain]
    b = (
        tel.filter(F.col("value_num").isNotNull())
        .groupBy(
            F.col("metric"), F.date_trunc(grain, F.col("time")).alias("bucket")
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(value_num AS DECIMAL(28,6))) * 1000000 AS BIGINT)"
            ).alias("s6")
        )
        .select("metric", F.unix_micros("bucket").alias("bucket_us"), "s6")
    )
    spine = tel.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    shifted = b.alias("a").crossJoin(F.broadcast(spine))
    pairs = (
        shifted.join(
            b.alias("b"),
            F.expr(
                f"a.bucket_us + CAST(lag AS BIGINT) * {step_us} = b.bucket_us"
                " AND a.metric < b.metric"
            ),
        )
        .select(
            F.col("a.metric").alias("metric_a"),
            F.col("b.metric").alias("metric_b"),
            "lag",
            F.col("a.s6").alias("x"),
            F.col("b.s6").alias("y"),
        )
    )
    dec = "DECIMAL(38,0)"
    agg = pairs.groupBy("metric_a", "metric_b", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"CAST(SUM(CAST(x AS {dec})) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM(CAST(y AS {dec})) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x AS {dec}) * y) AS DOUBLE)").alias("sxy"),
        F.expr(f"CAST(SUM(CAST(x AS {dec}) * x) AS DOUBLE)").alias("sxx"),
        F.expr(f"CAST(SUM(CAST(y AS {dec}) * y) AS DOUBLE)").alias("syy"),
    )
    return agg.selectExpr(
        "metric_a",
        "metric_b",
        "lag",
        "n AS n_buckets",
        "CAST(CAST(try_divide(n * sxy - sx * sy,"
        " sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        " AS DECIMAL(18,9)) AS DOUBLE) AS corr_value",
    )


# ---------------------------------------------------------------------------
# Driver-contract queries + DuckDB oracles
# ---------------------------------------------------------------------------


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_weighted_avg(telemetry(spark, sf_dir))


def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_bucket_gapfill(telemetry(spark, sf_dir))


def q_counter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return counter_agg(telemetry(spark, sf_dir))


def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trend_slope(telemetry(spark, sf_dir))


def q_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return m4_downsample(telemetry(spark, sf_dir))


def q_uptime(spark: SparkSession, sf_dir: str) -> DataFrame:
    return uptime_agg(telemetry(spark, sf_dir))


def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill_interpolate(telemetry(spark, sf_dir))


def q_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return state_durations(telemetry(spark, sf_dir))


def q_candlestick_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candlestick_merge(telemetry(spark, sf_dir))


def q_metric_pair_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metric_pair_correlation(telemetry(spark, sf_dir))


def q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lttb_downsample(telemetry(spark, sf_dir))


def q_lttb_time_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lttb_time_bucketed(telemetry(spark, sf_dir))


def theil_sen_trend(tel: DataFrame) -> DataFrame:
    """Per-metric Theil-Sen robust trend: the MEDIAN of all pairwise
    slopes between daily averages — the outlier-proof complement of
    :func:`trend_slope` (least squares has 0% breakdown: one stuck
    sensor day drags the OLS fit arbitrarily; the Sen estimator
    tolerates ~29% corrupted days).

    Scale: the raw scan collapses to a (metric, day) rollup FIRST —
    the only fact-sized shuffle.  Pairwise slopes are quadratic in
    #DAYS (rollup rows), not in samples: 3 years of history is
    ~6·10⁵ pairs per metric, independent of corpus size.  The median
    is taken on the ≤(days choose 2)-element slope list per metric —
    a bounded collect_list, the KMV/bounded-spine size class, never
    a data-proportional sort.

    Exactness: daily avg = exact DECIMAL(28,6) sum → one IEEE divide
    by the BIGINT count; each slope is one IEEE subtract + divide on
    those doubles, ulp-collapsed at DECIMAL(18,9); the lower median
    (element ceil(n/2) of the sorted list) is order-free.
    """
    dec = F.col("value_num").cast("decimal(28,6)")
    daily = (
        tel.filter(F.col("value_num").isNotNull())
        .groupBy("metric", F.to_date("time").alias("day"))
        .agg(F.sum(dec).alias("_s"), F.count(F.lit(1)).alias("_n"))
        .select(
            "metric",
            "day",
            (F.col("_s").cast("double") / F.col("_n")).alias("davg"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.metric") == F.col("b.metric"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.metric").alias("metric"),
        (
            (F.col("b.davg") - F.col("a.davg"))
            / F.datediff(F.col("b.day"), F.col("a.day")).cast("double")
        )
        .cast("decimal(18,9)")
        .cast("double")
        .alias("slope"),
    )
    per_metric = slopes.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr(
            "element_at(array_sort(collect_list(slope)),"
            " CAST(ceil(count(*) / 2.0) AS INT))"
        ).alias("sen_slope_per_day"),
    )
    n_days = daily.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    return per_metric.join(n_days, "metric").select(
        "metric", "n_days", "n_pairs", "sen_slope_per_day"
    )


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return theil_sen_trend(telemetry(spark, sf_dir))


def _daily_sums(tel: DataFrame) -> DataFrame:
    """(metric, day, day_idx, s, n, davg) — exact DECIMAL(28,6) daily
    sum + count, davg as the repo-standard raw double (exact sum →
    one IEEE division, NO decimal re-round: rounding a mean back to
    the decimal grid creates exact HALF ties whenever the count is a
    power of two, and Spark [HALF_UP] and DuckDB [half-even] break
    ties differently — the rollup exact_avg convention avoids the
    midpoint entirely).  day_idx = epoch days (pure integer weekday /
    RANGE key, no locale/tz semantics)."""
    dec = F.col("value_num").cast("decimal(28,6)")
    return (
        tel.filter(F.col("value_num").isNotNull())
        .groupBy("metric", F.to_date("time").alias("day"))
        .agg(F.sum(dec).alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "metric",
            "day",
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias(
                "day_idx"
            ),
            "s",
            "n",
            (F.col("s").cast("double") / F.col("n")).alias("davg"),
        )
    )


SEASONAL_MA_HALF = 3  # centered 7-day moving average


def seasonal_decompose(tel: DataFrame) -> DataFrame:
    """Classical seasonal-trend decomposition of each metric's daily
    series: trend = centered 7-day moving average, seasonal = mean
    detrended value per day-of-week slot, residual = the rest — the
    decomposition behind "is Monday always like this, or is today
    broken" triage (the batch complement of seasonal_anomalies'
    hour-of-day z-scores).

    Scale: the ONLY fact-sized operation is the daily rollup; every
    window after it runs on the (metric, day) spine —
    time-proportional, never data-proportional (error_burst_windows
    precedent).  The weekday slot is epoch-days mod 7 (pure integer,
    no locale/tz semantics to disagree on).

    Exactness (no-midpoint discipline): the trend is the POOLED
    7-day mean — exact decimal sums of sums and of counts, ONE IEEE
    division — and every published mean stays a raw double (see
    _daily_sums: re-rounding means to the decimal grid creates exact
    HALF ties that Spark and DuckDB break differently).  Detrended
    values are collapsed to DECIMAL(18,12) for the order-free
    seasonal sums — at that scale the summed integer units stay
    below 2^53, so BOTH engines' decimal->double casts are EXACT
    (DuckDB double-rounds int128-backed wider decimals; the
    trend_slope gotcha); seasonal and residual are again single
    IEEE ops on identical operands.  Edge days (incomplete 7-day window) publish NULL
    trend/seasonal/residual and stay out of the seasonal means.
    """
    daily = _daily_sums(tel)
    w7_sql = (
        f"(PARTITION BY metric ORDER BY day_idx RANGE BETWEEN"
        f" {SEASONAL_MA_HALF} PRECEDING AND {SEASONAL_MA_HALF} FOLLOWING)"
    )
    with_trend = daily.select(
        "metric",
        "day",
        "day_idx",
        "davg",
        F.expr(
            f"CASE WHEN COUNT(*) OVER {w7_sql} = {2 * SEASONAL_MA_HALF + 1}"
            f" THEN CAST(SUM(s) OVER {w7_sql} AS DOUBLE)"
            f" / CAST(SUM(n) OVER {w7_sql} AS DOUBLE) END"
        ).alias("trend"),
    )
    detrended = with_trend.withColumn(
        "_det", F.expr("CAST(davg - trend AS DECIMAL(18,12))")
    ).withColumn("_wd", F.pmod(F.col("day_idx"), F.lit(7)))
    seasonal = detrended.groupBy("metric", "_wd").agg(
        F.expr(
            "CAST(SUM(_det) AS DOUBLE) / CAST(COUNT(_det) AS DOUBLE)"
        ).alias("_seas")
    )
    out = detrended.join(F.broadcast(seasonal), ["metric", "_wd"])
    return out.select(
        "metric",
        "day",
        "davg",
        "trend",
        F.when(F.col("_det").isNotNull(), F.col("_seas")).alias("seasonal"),
        F.expr("CAST(_det AS DOUBLE) - _seas").alias("residual"),
    )


def spearman_correlation(tel: DataFrame) -> DataFrame:
    """Spearman rank correlation per metric pair over the daily-avg
    series — the monotone-dependence complement of the Pearson
    metric_pair_correlation (robust to outliers and nonlinearity).

    rho = 1 - 6·Σd² / (n·(n²-1)) over rank vectors, with ranks
    assigned by (value, day) row_number — a deterministic total
    order, so Σd² is EXACT integer arithmetic and rho is one IEEE
    expression per pair: the contract is a plain hash match, no
    variance guards or ulp collapse needed (n <= 1 abstains via
    try_divide).  Ranks are per-metric over the full rollup spine;
    pairs join on common days (the fixture's spines are identical —
    on ragged real data, filter to the common spine first).
    All windows run on the rollup, partitioned by metric.
    """
    daily = _daily_sums(tel)
    w = Window.partitionBy("metric").orderBy("davg", "day_idx")
    ranked = daily.select(
        "metric", "day_idx", F.row_number().over(w).alias("rk")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.day_idx") == F.col("b.day_idx"))
        & (F.col("a.metric") < F.col("b.metric")),
    ).select(
        F.col("a.metric").alias("metric_a"),
        F.col("b.metric").alias("metric_b"),
        ((F.col("a.rk") - F.col("b.rk")) * (F.col("a.rk") - F.col("b.rk"))).alias(
            "_d2"
        ),
    )
    agg = pairs.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_d2").alias("_sd2"),
    )
    return agg.select(
        "metric_a",
        "metric_b",
        "n_days",
        F.expr(
            "1.0 - try_divide(6.0 * CAST(_sd2 AS DOUBLE),"
            " CAST(n_days AS DOUBLE)"
            " * (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) - 1.0))"
        ).alias("spearman_rho"),
    )


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_decompose(telemetry(spark, sf_dir))


def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spearman_correlation(telemetry(spark, sf_dir))


QUERIES = {
    "theil_sen_trend": q_theil_sen,
    "seasonal_decompose": q_seasonal_decompose,
    "spearman_correlation": q_spearman,
    "state_durations": q_state_durations,
    "time_weighted_avg": q_time_weighted_avg,
    "time_bucket_gapfill": q_gapfill,
    "gapfill_interpolate": q_gapfill_interp,
    "counter_agg": q_counter_agg,
    "trend_slope": q_trend_slope,
    "m4_downsample": q_m4,
    "uptime_agg": q_uptime,
    "candlestick_merge": q_candlestick_merge,
    "metric_pair_correlation": q_metric_pair_correlation,
    "lead_lag_correlation": lambda spark, sf: lead_lag_correlation(
        telemetry(spark, sf)
    ),
    "lttb_downsample": q_lttb,
    "lttb_time_bucketed": q_lttb_time_bucketed,
}

ORACLES = {
    "state_durations": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
seq AS (
  SELECT operator, metric, "time", event_id,
         epoch_us(LEAD("time") OVER w) - epoch_us("time") AS dt,
         LAG(metric) OVER w AS prev_state
  FROM telemetry WHERE operator IS NOT NULL
  WINDOW w AS (PARTITION BY operator ORDER BY "time", event_id)
)
SELECT operator, metric AS state,
       CAST(COALESCE(SUM(dt), 0) AS BIGINT) AS duration_micros,
       CAST(SUM(CASE WHEN prev_state IS NULL OR prev_state <> metric
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_entries,
       COUNT(*) AS n_samples
FROM seq
GROUP BY operator, metric
""",
    "time_weighted_avg": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
samples AS (
  SELECT metric, "time", event_id, value_num,
         epoch_us(LEAD("time") OVER (PARTITION BY metric
                                     ORDER BY "time", event_id))
           - epoch_us("time") AS dt
  FROM telemetry WHERE value_num IS NOT NULL
)
SELECT metric,
       CAST(SUM(CAST(value_num * CAST(dt AS DOUBLE) AS DECIMAL(38,6)))
            AS DOUBLE) / CAST(SUM(dt) AS DOUBLE) AS time_weighted_avg,
       CAST(SUM(dt) AS BIGINT) AS total_weight_micros,
       COUNT(*) AS n_weighted_samples
FROM samples WHERE dt IS NOT NULL
GROUP BY metric
""",
    "counter_agg": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
samples AS (
  SELECT metric, "time", event_id, value_num,
         LAG(value_num) OVER (PARTITION BY metric
                              ORDER BY "time", event_id) AS prev
  FROM telemetry WHERE value_num IS NOT NULL
),
incs AS (
  SELECT metric, "time", value_num, prev,
         CASE WHEN prev IS NULL THEN NULL
              WHEN value_num >= prev THEN value_num - prev
              ELSE value_num END AS inc
  FROM samples
)
SELECT metric,
       CAST(SUM(CAST(inc AS DECIMAL(38,6))) AS DOUBLE) AS counter_delta,
       CAST(COUNT(CASE WHEN value_num < prev THEN 1 END) AS BIGINT)
         AS n_resets,
       CAST(SUM(CAST(inc AS DECIMAL(38,6))) AS DOUBLE)
         / (CAST(epoch_us(MAX("time")) - epoch_us(MIN("time")) AS DOUBLE)
            / 1e6) AS rate_per_sec
FROM incs
GROUP BY metric
""",
    "trend_slope": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
samples AS (
  SELECT metric, value_num,
         CAST(epoch_us("time")
                - MIN(epoch_us("time")) OVER (PARTITION BY metric)
              AS DOUBLE) AS x
  FROM telemetry WHERE value_num IS NOT NULL
),
agg AS (
  SELECT metric,
         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value_num AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * value_num AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(COUNT(*) AS DOUBLE) AS n,
         COUNT(*) AS n_samples
  FROM samples GROUP BY metric
)
SELECT metric,
       CAST(CAST(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e6
                 AS DECIMAL(38,12)) AS DOUBLE) AS slope_per_sec,
       CAST(CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                 AS DECIMAL(38,12)) AS DOUBLE) AS intercept,
       n_samples
FROM agg
""",
    # Full-history windows are fine HERE (oracles don't scale); the
    # arithmetic mirrors the Spark side token-for-token: exact integer
    # micros sums (HUGEINT = DECIMAL(38,0)), DECIMAL(28,6) value sums,
    # pinned-order IEEE area, MAX + equality + min-okey tiebreak.
    "lttb_downsample": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
s AS (
  SELECT metric, "time", event_id, value_num,
         epoch_us("time") AS x_us,
         ROW_NUMBER() OVER (PARTITION BY metric
                            ORDER BY "time", event_id) AS rk,
         COUNT(*) OVER (PARTITION BY metric) AS n
  FROM telemetry WHERE value_num IS NOT NULL
),
small AS (
  SELECT metric, CAST(rk - 1 AS INT) AS bucket_idx, "time",
         value_num AS value
  FROM s WHERE n <= {LTTB_N_OUT}
),
pts AS (
  SELECT *, CASE WHEN rk = 1 THEN 0
                 WHEN rk = n THEN {LTTB_N_OUT - 1}
                 ELSE CAST(1 + (((rk - 2) * {LTTB_N_OUT - 2}) // (n - 2))
                           AS INT) END AS idx
  FROM s WHERE n > {LTTB_N_OUT}
),
bavg AS (
  SELECT metric, idx,
         CAST(SUM(CAST(x_us AS HUGEINT)) AS DOUBLE) / COUNT(*) AS ax,
         CAST(SUM(CAST(value_num AS DECIMAL(28,6))) AS DOUBLE)
           / COUNT(*) AS ay
  FROM pts GROUP BY 1, 2
),
mids AS (
  SELECT p.metric, p.idx, p."time", p.value_num,
         abs((a.ax - c.ax) * (p.value_num - a.ay)
             - (a.ax - CAST(p.x_us AS DOUBLE)) * (c.ay - a.ay)) AS area,
         lpad(CAST(p.x_us AS VARCHAR), 20, '0') || '-'
           || lpad(CAST(p.event_id AS VARCHAR), 20, '0') AS okey
  FROM pts p
  JOIN bavg a ON a.metric = p.metric AND a.idx = p.idx - 1
  JOIN bavg c ON c.metric = p.metric AND c.idx = p.idx + 1
  WHERE p.idx BETWEEN 1 AND {LTTB_N_OUT - 2}
),
amax AS (SELECT metric, idx, MAX(area) AS amax FROM mids GROUP BY 1, 2),
sel AS (
  SELECT m.metric, CAST(m.idx AS INT) AS bucket_idx,
         arg_min(m."time", m.okey) AS "time",
         arg_min(m.value_num, m.okey) AS value
  FROM mids m
  JOIN amax x ON x.metric = m.metric AND x.idx = m.idx
             AND m.area = x.amax
  GROUP BY 1, 2
),
ends AS (
  SELECT metric, CAST(idx AS INT) AS bucket_idx, "time",
         value_num AS value
  FROM pts WHERE rk = 1 OR rk = n
)
SELECT * FROM small
UNION ALL SELECT * FROM ends
UNION ALL SELECT * FROM sel
""",
    # Exact-integer Pearson: HUGEINT here mirrors Spark's
    # DECIMAL(38,0) — both are exact on the micro-unit products/sums,
    # so only the pinned-order closed form touches floating point.
    "lead_lag_correlation": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
b AS (
  SELECT metric, epoch_us(date_trunc('hour', "time")) AS bucket_us,
         CAST(SUM(CAST(value_num AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS s6
  FROM telemetry WHERE value_num IS NOT NULL
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.metric AS metric_a, bb.metric AS metric_b, l.lag,
         a.s6 AS x, bb.s6 AS y
  FROM b a
  CROSS JOIN (SELECT UNNEST(generate_series(-{LEADLAG_MAX}, {LEADLAG_MAX}))
              AS lag) l
  JOIN b bb ON a.bucket_us + CAST(l.lag AS BIGINT) * 3600000000
               = bb.bucket_us
           AND a.metric < bb.metric
),
agg AS (
  SELECT metric_a, metric_b, lag,
         COUNT(*) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM pairs GROUP BY 1, 2, 3
)
SELECT metric_a, metric_b, CAST(lag AS INTEGER) AS lag, n AS n_buckets,
       CAST(CAST((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
            AS DECIMAL(18,9)) AS DOUBLE) AS corr_value
FROM agg
""",
    "metric_pair_correlation": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
b AS (
  SELECT metric, date_trunc('hour', "time") AS bucket,
         CAST(SUM(CAST(value_num AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS s6
  FROM telemetry WHERE value_num IS NOT NULL
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.metric AS metric_a, bb.metric AS metric_b, a.s6 AS x, bb.s6 AS y
  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.metric < bb.metric
),
agg AS (
  SELECT metric_a, metric_b,
         COUNT(*) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT metric_a, metric_b, n AS n_buckets,
       CAST(CAST((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
            AS DECIMAL(18,9)) AS DOUBLE) AS corr_value
FROM agg
""",
    # Day candles DIRECTLY from raw rows: parity with the Spark side's
    # hour-partial merge proves the candlestick monoid identity.
    "candlestick_merge": f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT metric,
       CAST(date_trunc('day', "time") AS DATE) AS day,
       arg_min(value_num, lpad(CAST(epoch_us("time") AS VARCHAR), 20, '0')
                          || '-' || lpad(CAST(event_id AS VARCHAR), 20, '0'))
         AS open_value,
       MAX(value_num) AS high_value,
       MIN(value_num) AS low_value,
       arg_max(value_num, lpad(CAST(epoch_us("time") AS VARCHAR), 20, '0')
                          || '-' || lpad(CAST(event_id AS VARCHAR), 20, '0'))
         AS close_value,
       COUNT(*) AS n_samples
FROM telemetry
WHERE value_num IS NOT NULL
GROUP BY 1, 2
""",
    "m4_downsample": f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT metric,
       date_trunc('minute', "time") AS bucket,
       arg_min(value_num, lpad(CAST(epoch_us("time") AS VARCHAR), 20, '0')
                          || '-' || lpad(CAST(event_id AS VARCHAR), 20, '0'))
         AS first_value,
       arg_max(value_num, lpad(CAST(epoch_us("time") AS VARCHAR), 20, '0')
                          || '-' || lpad(CAST(event_id AS VARCHAR), 20, '0'))
         AS last_value,
       MIN(value_num) AS min_value,
       MAX(value_num) AS max_value,
       COUNT(*) AS n_samples
FROM telemetry
WHERE value_num IS NOT NULL
GROUP BY 1, 2
""",
    "uptime_agg": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
flagged AS (
  SELECT metric, "time",
         SUM(CASE WHEN prev IS NULL
                    OR epoch_us("time") - epoch_us(prev)
                       > {HEARTBEAT_TOLERANCE_SEC} * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY metric ORDER BY "time", event_id
                 ROWS UNBOUNDED PRECEDING) AS interval_id
  FROM (SELECT metric, "time", event_id,
               LAG("time") OVER (PARTITION BY metric
                                 ORDER BY "time", event_id) AS prev
        FROM telemetry)
),
intervals AS (
  SELECT metric, interval_id,
         epoch_us(MAX("time")) - epoch_us(MIN("time")) AS span_micros
  FROM flagged GROUP BY metric, interval_id
)
SELECT metric,
       COUNT(*) AS n_intervals,
       CAST(SUM(span_micros) AS BIGINT) AS uptime_micros
FROM intervals
GROUP BY metric
""",
    "time_bucket_gapfill": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
samples AS (SELECT * FROM telemetry WHERE value_num IS NOT NULL),
observed AS (
  SELECT metric, date_trunc('minute', "time") AS bucket,
         CAST(SUM(CAST(value_num AS DECIMAL(38,6))) AS DOUBLE)
           / COUNT(value_num) AS avg_value
  FROM samples GROUP BY 1, 2
),
spine AS (
  SELECT metric,
         UNNEST(generate_series(date_trunc('minute', mn),
                                date_trunc('minute', mx),
                                INTERVAL '1 minute')) AS bucket
  FROM (SELECT metric, MIN("time") AS mn, MAX("time") AS mx
        FROM samples GROUP BY metric)
)
SELECT s.metric, s.bucket,
       LAST_VALUE(o.avg_value IGNORE NULLS)
         OVER (PARTITION BY s.metric ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS avg_value,
       o.avg_value IS NULL AS is_gap
FROM spine s LEFT JOIN observed o
  ON s.metric = o.metric AND s.bucket = o.bucket
""",
    "gapfill_interpolate": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
samples AS (SELECT * FROM telemetry WHERE value_num IS NOT NULL),
observed AS (
  SELECT metric, date_trunc('minute', "time") AS bucket,
         CAST(SUM(CAST(value_num AS DECIMAL(38,6))) AS DOUBLE)
           / COUNT(value_num) AS avg_value
  FROM samples GROUP BY 1, 2
),
spine AS (
  SELECT metric,
         UNNEST(generate_series(date_trunc('minute', mn),
                                date_trunc('minute', mx),
                                INTERVAL '1 minute')) AS bucket
  FROM (SELECT metric, MIN("time") AS mn, MAX("time") AS mx
        FROM samples GROUP BY metric)
),
anchored AS (
  SELECT s.metric, s.bucket, o.avg_value,
         LAST_VALUE(o.avg_value IGNORE NULLS)
           OVER (PARTITION BY s.metric ORDER BY s.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_v,
         LAST_VALUE(CASE WHEN o.avg_value IS NOT NULL THEN s.bucket END
                    IGNORE NULLS)
           OVER (PARTITION BY s.metric ORDER BY s.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_t,
         FIRST_VALUE(o.avg_value IGNORE NULLS)
           OVER (PARTITION BY s.metric ORDER BY s.bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_v,
         FIRST_VALUE(CASE WHEN o.avg_value IS NOT NULL THEN s.bucket END
                     IGNORE NULLS)
           OVER (PARTITION BY s.metric ORDER BY s.bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_t
  FROM spine s LEFT JOIN observed o
    ON s.metric = o.metric AND s.bucket = o.bucket
)
SELECT metric, bucket,
       CASE WHEN avg_value IS NOT NULL THEN avg_value
            ELSE prev_v + (next_v - prev_v)
                 * (CAST(epoch_us(bucket) - epoch_us(prev_t) AS DOUBLE)
                    / CAST(epoch_us(next_t) - epoch_us(prev_t) AS DOUBLE))
       END AS value,
       avg_value IS NULL AS is_gap
FROM anchored
""",
}

# Same exactness contract as lttb_downsample's oracle (integer micros
# sums, DECIMAL(28,6) value sums, pinned-order IEEE area, arg_min
# tiebreak); UNION (distinct) mirrors the Spark .distinct() for the
# single-bucket first==last case.
ORACLES["lttb_time_bucketed"] = f"""
WITH telemetry AS ({{TELEMETRY_SQL}}),
p AS (
  SELECT metric, "time", event_id, value_num,
         epoch_us("time") AS x_us,
         epoch_us("time") // {{LTTB_TB_STEP}} AS bkt,
         lpad(CAST(epoch_us("time") AS VARCHAR), 20, '0') || '-'
           || lpad(CAST(event_id AS VARCHAR), 20, '0') AS okey
  FROM telemetry WHERE value_num IS NOT NULL
),
bavg AS (
  SELECT metric, bkt,
         CAST(SUM(CAST(x_us AS HUGEINT)) AS DOUBLE) / COUNT(*) AS ax,
         CAST(SUM(CAST(value_num AS DECIMAL(28,6))) AS DOUBLE)
           / COUNT(*) AS ay
  FROM p GROUP BY 1, 2
),
nb AS (
  SELECT metric, bkt,
         lag(ax) OVER w AS xa, lag(ay) OVER w AS ya,
         lead(ax) OVER w AS xn, lead(ay) OVER w AS yn
  FROM bavg WINDOW w AS (PARTITION BY metric ORDER BY bkt)
),
j AS (
  SELECT p.*, nb.xa, nb.ya, nb.xn, nb.yn
  FROM p JOIN nb USING (metric, bkt)
),
mids AS (
  SELECT metric, bkt, "time", value_num, okey,
         abs((xa - xn) * (value_num - ya)
             - (xa - CAST(x_us AS DOUBLE)) * (yn - ya)) AS area
  FROM j WHERE xa IS NOT NULL AND xn IS NOT NULL
),
amax AS (SELECT metric, bkt, MAX(area) AS amax FROM mids GROUP BY 1, 2),
sel AS (
  SELECT m.metric, m.bkt, arg_min(m."time", m.okey) AS "time",
         arg_min(m.value_num, m.okey) AS value
  FROM mids m
  JOIN amax x ON x.metric = m.metric AND x.bkt = m.bkt
             AND m.area = x.amax
  GROUP BY 1, 2
),
firsts AS (
  SELECT metric, bkt, arg_min("time", okey) AS "time",
         arg_min(value_num, okey) AS value
  FROM j WHERE xa IS NULL GROUP BY 1, 2
),
lasts AS (
  SELECT metric, bkt, arg_max("time", okey) AS "time",
         arg_max(value_num, okey) AS value
  FROM j WHERE xn IS NULL GROUP BY 1, 2
),
u AS (
  SELECT * FROM sel
  UNION SELECT * FROM firsts
  UNION SELECT * FROM lasts
)
SELECT metric,
       CAST(to_timestamp(bkt * {{LTTB_TB_SEC}}) AS TIMESTAMP) AS bucket,
       "time", value
FROM u
""".format(
    TELEMETRY_SQL=TELEMETRY_SQL,
    LTTB_TB_STEP=LTTB_TB_BUCKET_SEC * 1_000_000,
    LTTB_TB_SEC=LTTB_TB_BUCKET_SEC,
)

ORACLES["theil_sen_trend"] = f"""
WITH telemetry AS ({TELEMETRY_SQL}),
daily AS (
  SELECT metric, CAST("time" AS DATE) AS day,
         CAST(SUM(CAST(value_num AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
           AS davg
  FROM telemetry WHERE value_num IS NOT NULL
  GROUP BY 1, 2
),
slopes AS (
  SELECT a.metric,
         CAST(CAST((b.davg - a.davg) / CAST(b.day - a.day AS DOUBLE)
              AS DECIMAL(18,9)) AS DOUBLE) AS slope
  FROM daily a
  JOIN daily b ON a.metric = b.metric AND a.day < b.day
),
med AS (
  SELECT metric, COUNT(*) AS n_pairs,
         list_sort(list(slope))[CAST(ceil(COUNT(*) / 2.0) AS INT)]
           AS sen_slope_per_day
  FROM slopes GROUP BY metric
)
SELECT m.metric, d.n_days, m.n_pairs, m.sen_slope_per_day
FROM med m
JOIN (SELECT metric, COUNT(*) AS n_days FROM daily GROUP BY metric) d
  ON m.metric = d.metric
"""

_DAILY_SUMS_SQL = f"""
  SELECT metric, CAST("time" AS DATE) AS day,
         CAST(CAST("time" AS DATE) - DATE '1970-01-01' AS INT) AS day_idx,
         SUM(CAST(value_num AS DECIMAL(28,6))) AS s,
         COUNT(*) AS n,
         CAST(SUM(CAST(value_num AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
           AS davg
  FROM telemetry WHERE value_num IS NOT NULL
  GROUP BY 1, 2
"""

ORACLES["seasonal_decompose"] = f"""
WITH telemetry AS ({TELEMETRY_SQL}),
daily AS ({_DAILY_SUMS_SQL}),
with_trend AS (
  SELECT metric, day, day_idx, davg,
         CASE WHEN COUNT(*) OVER w = {2 * SEASONAL_MA_HALF + 1} THEN
           CAST(SUM(s) OVER w AS DOUBLE) / CAST(SUM(n) OVER w AS DOUBLE)
         END AS trend
  FROM daily
  WINDOW w AS (PARTITION BY metric ORDER BY day_idx
               RANGE BETWEEN {SEASONAL_MA_HALF} PRECEDING
                         AND {SEASONAL_MA_HALF} FOLLOWING)
),
det AS (
  SELECT *,
         CAST(davg - trend AS DECIMAL(18,12)) AS _det,
         day_idx % 7 AS _wd
  FROM with_trend
),
seas AS (
  SELECT metric, _wd,
         CAST(SUM(_det) AS DOUBLE) / CAST(COUNT(_det) AS DOUBLE) AS _seas
  FROM det GROUP BY 1, 2
)
SELECT d.metric, d.day, d.davg, d.trend,
       CASE WHEN d._det IS NOT NULL THEN s._seas END AS seasonal,
       CAST(d._det AS DOUBLE) - s._seas AS residual
FROM det d JOIN seas s ON d.metric = s.metric AND d._wd = s._wd
"""

ORACLES["spearman_correlation"] = f"""
WITH telemetry AS ({TELEMETRY_SQL}),
daily AS ({_DAILY_SUMS_SQL}),
ranked AS (
  SELECT metric, day_idx,
         ROW_NUMBER() OVER (PARTITION BY metric
                            ORDER BY davg, day_idx) AS rk
  FROM daily
),
pairs AS (
  SELECT a.metric AS metric_a, b.metric AS metric_b,
         (a.rk - b.rk) * (a.rk - b.rk) AS d2
  FROM ranked a
  JOIN ranked b ON a.day_idx = b.day_idx AND a.metric < b.metric
),
agg AS (
  SELECT metric_a, metric_b, COUNT(*) AS n_days,
         CAST(SUM(d2) AS BIGINT) AS sd2
  FROM pairs GROUP BY 1, 2
)
SELECT metric_a, metric_b, n_days,
       1.0 - (6.0 * CAST(sd2 AS DOUBLE))
           / NULLIF(CAST(n_days AS DOUBLE)
             * (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) - 1.0), 0)
         AS spearman_rho
FROM agg
"""

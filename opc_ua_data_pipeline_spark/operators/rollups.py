"""Windowed rollups — continuous-aggregate equivalents (SURVEY.md §2.5).

The reference materializes ``machine_stats_minute`` /
``machine_stats_hourly`` as TimescaleDB continuous aggregates
(database/init.sql:18-29,37-48): ``time_bucket('1 minute'|'1 hour',
time) x metric -> avg,min,max,count of value_num`` over non-null
values.  Batch form here; the incremental-refresh policies (G3/G4,
init.sql:31-34,51-54) live in :mod:`..streaming.rollup` as
watermarked Structured Streaming aggregations.

Scale notes:
* `groupBy(date_trunc, metric)` is ONE shuffle with map-side partial
  aggregation (HashAggregate partial->final); at 100 TB the partials
  shrink the exchange to #buckets x #metrics rows per task.
* ``time_bucket`` ≡ ``date_trunc`` for minute/hour granularity with a
  UTC session (epoch-aligned origins) — SURVEY.md §7 risk list.

Float determinism: Spark and DuckDB sum partitions in different
orders, so a double SUM/AVG differs in final ulps between engines.
Every mean here is computed as an exact DECIMAL sum (associative,
order-independent) cast once to double and divided by the count —
bit-identical in both engines, no rounding tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .ingest import TELEMETRY_SQL, telemetry

#: Decimal type wide enough for ~1e9 rows of 1e6-magnitude measures
#: while staying inside both engines' 38-digit ceiling after SUM.
_DEC = "decimal(28,6)"


def exact_avg(col: str | Column, count_col: str | Column | None = None) -> Column:
    """Order-independent mean: exact decimal sum -> double -> / count."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c) if count_col is None else (
        F.col(count_col) if isinstance(count_col, str) else count_col
    )
    return F.sum(c.cast(_DEC)).cast("double") / n


def _avg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr})"


def machine_stats(df: DataFrame, granularity: str) -> DataFrame:
    """G1/G2 — tumbling-bucket stats per metric (init.sql:22-28,41-47).

    ``granularity`` is 'minute' or 'hour'.  Filter before aggregate so
    the NULL-skip (init.sql:28,47 ``WHERE value_num IS NOT NULL``)
    also prunes rows ahead of the shuffle.
    """
    return (
        df.filter(F.col("value_num").isNotNull())
        .groupBy(
            F.date_trunc(granularity, F.col("time")).alias("bucket"),
            F.col("metric"),
        )
        .agg(
            exact_avg("value_num").alias("avg_value"),
            F.min("value_num").alias("min_value"),
            F.max("value_num").alias("max_value"),
            F.count("value_num").alias("sample_count"),
        )
    )


def _machine_stats_sql(granularity: str) -> str:
    return f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT date_trunc('{granularity}', "time") AS bucket,
       metric,
       {_avg_sql("value_num")} AS avg_value,
       MIN(value_num) AS min_value,
       MAX(value_num) AS max_value,
       COUNT(value_num) AS sample_count
FROM telemetry
WHERE value_num IS NOT NULL
GROUP BY 1, 2
"""


def machine_stats_partials(df: DataFrame, granularity: str) -> DataFrame:
    """Partial-aggregate form of the rollup: exact decimal SUM + count
    instead of the derived mean — TimescaleDB stores exactly this
    (partial aggregate state per bucket) so coarser rollups and
    refreshes combine partials instead of rescanning raw data."""
    return (
        df.filter(F.col("value_num").isNotNull())
        .groupBy(
            F.date_trunc(granularity, F.col("time")).alias("bucket"),
            F.col("metric"),
        )
        .agg(
            F.sum(F.col("value_num").cast(_DEC)).alias("sum_value"),
            F.min("value_num").alias("min_value"),
            F.max("value_num").alias("max_value"),
            F.count("value_num").alias("sample_count"),
        )
    )


def combine_partials(partials: DataFrame, granularity: str) -> DataFrame:
    """Roll partials up to a coarser granularity (minute -> hour -> day)
    and finalize the mean.  Decimal sums are associative, so the result
    is bit-identical to aggregating the raw rows — the core partial/
    final property that makes hierarchical rollups free at 100 TB
    (the hour job reads #minute-buckets rows, not the fact table)."""
    return (
        partials.groupBy(
            F.date_trunc(granularity, F.col("bucket")).alias("bucket"),
            F.col("metric"),
        )
        .agg(
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("sample_count").alias("sample_count"),
        )
        .select(
            "bucket",
            "metric",
            (F.col("sum_value").cast("double") / F.col("sample_count")).alias(
                "avg_value"
            ),
            "min_value",
            "max_value",
            "sample_count",
        )
    )


SLIDING_WINDOW = "5 minutes"
SLIDING_SLIDE = "1 minute"


def machine_stats_sliding(
    df: DataFrame,
    window: str = SLIDING_WINDOW,
    slide: str = SLIDING_SLIDE,
) -> DataFrame:
    """Sliding-window stats per metric: every minute, the trailing
    5-minute window's avg/min/max/count — the overlapping-window
    generalization of G1/G2 (the reference only has tumbling buckets;
    a trailing-window panel would need this).

    ``F.window(time, size, slide)`` assigns each row to its
    size/slide = 5 overlapping windows inside the aggregation — the
    expansion happens in the partial-aggregate stage, so the shuffle
    carries per-(window, metric) partials, not 5x the input rows.
    Epoch-aligned window starts match the DuckDB oracle's
    ``date_trunc(minute) - k minutes`` expansion exactly.
    """
    return (
        df.filter(F.col("value_num").isNotNull())
        .groupBy(
            F.window(F.col("time"), window, slide).alias("w"),
            F.col("metric"),
        )
        .agg(
            exact_avg("value_num").alias("avg_value"),
            F.min("value_num").alias("min_value"),
            F.max("value_num").alias("max_value"),
            F.count("value_num").alias("sample_count"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "metric",
            "avg_value",
            "min_value",
            "max_value",
            "sample_count",
        )
    )


_SLIDING_SQL = f"""
WITH telemetry AS ({{telemetry}}),
expanded AS (
  SELECT date_trunc('minute', "time") - (g.k * INTERVAL 1 MINUTE)
             AS bucket_start,
         metric,
         value_num
  FROM telemetry
  CROSS JOIN generate_series(0, 4) AS g(k)
  WHERE value_num IS NOT NULL
)
SELECT bucket_start,
       metric,
       {_avg_sql("value_num")} AS avg_value,
       MIN(value_num) AS min_value,
       MAX(value_num) AS max_value,
       COUNT(value_num) AS sample_count
FROM expanded
GROUP BY 1, 2
"""


HLL_MERGE_RTOL = 0.15  # sketch estimates are engine-specific; bounded


def hll_rollup_merge(events: DataFrame) -> DataFrame:
    """Mergeable-sketch hierarchical rollup: per-(event_type, minute)
    HLL sketches (Datasketches ``hll_sketch_agg``) UNIONED up to the
    hour grain — the sketch analog of q_rollup_hourly_hierarchical,
    and the only way distinct-count rollups compose at 100 TB (exact
    distinct partials don't add; HLL registers max-merge losslessly).
    A serving layer stores the minute sketches once and answers any
    coarser grain by union, never rescanning the fact table.

    Contract shape follows approx_distinct_users: the exact hourly
    distinct count is hash-matched, the merged estimate is bounded
    (``merge_ok``) because sketch internals are engine-specific.
    """
    minute = F.date_trunc("minute", F.col("ts"))
    partials = events.groupBy(
        F.col("event_type"), minute.alias("m")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = partials.groupBy(
        "event_type", F.date_trunc("hour", F.col("m")).alias("bucket")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_users")
    )
    exact = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return exact.join(merged, ["event_type", "bucket"]).select(
        "event_type",
        "bucket",
        "exact_users",
        (
            F.abs(F.col("merged_users") - F.col("exact_users"))
            <= F.lit(HLL_MERGE_RTOL) * F.col("exact_users")
        ).alias("merge_ok"),
    )


WAU_WINDOW_DAYS = 7


def sliding_wau_sketch(
    events: DataFrame, window_days: int = WAU_WINDOW_DAYS
) -> DataFrame:
    """Sliding weekly-active-users from mergeable daily HLL sketches:
    one sketch per day, each trailing-7-day answer a UNION of 7 daily
    sketches — the windowed companion of :func:`hll_rollup_merge`, and
    the only shape where a sliding DISTINCT window is affordable at
    100 TB.  An exact sliding countDistinct must re-scan every fact
    row ``window_days`` times (distinct partials don't add); the
    sketch path scans the fact table ONCE into #days sketches, and the
    window slide replicates only the #days-row sketch table — any
    window length, any slide, no rescan.

    Contract shape per hll_rollup_merge: the exact trailing distinct
    (computed here only as the verification harness, replicating the
    fact rows window_days times) is hash-matched; the sketch estimate
    is bounded (``wau_ok``) because sketch internals are
    engine-specific.  Trailing windows at the span's left edge are
    partial (fewer than window_days days) on both paths alike.
    """
    day = F.to_date("ts")
    daily = events.groupBy(day.alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    offsets = events.sparkSession.range(0, window_days).select(
        F.col("id").cast("int").alias("off")
    )
    # end_day spine: only days that actually occur (semi join) so the
    # output grain matches the exact side's
    spine = daily.select("day")
    merged = (
        daily.crossJoin(F.broadcast(offsets))
        .withColumn("end_day", F.date_add("day", F.col("off")))
        .join(F.broadcast(spine.withColumnRenamed("day", "end_day")), "end_day", "left_semi")
        .groupBy("end_day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_est")
        )
    )
    exact = (
        events.select(day.alias("day"), "user_id")
        .crossJoin(F.broadcast(offsets))
        .withColumn("end_day", F.date_add("day", F.col("off")))
        .join(F.broadcast(spine.withColumnRenamed("day", "end_day")), "end_day", "left_semi")
        .groupBy("end_day")
        .agg(F.countDistinct("user_id").alias("exact_wau"))
    )
    return exact.join(merged, "end_day").select(
        "end_day",
        "exact_wau",
        (
            F.abs(F.col("wau_est") - F.col("exact_wau"))
            <= F.lit(HLL_MERGE_RTOL) * F.col("exact_wau")
        ).alias("wau_ok"),
    )


#: Fixed-bin histogram grid for the mergeable percentile rollup.
#: Data-independent breaks are what make the partials mergeable AND
#: streaming-compatible (no global min/max pre-pass); the grid covers
#: the events.value domain with clamping edge bins.
HIST_LO = 0.0
HIST_W = 4.0
HIST_BINS = 256


def histogram_rollup_percentiles(events: DataFrame) -> DataFrame:
    """Mergeable-histogram hierarchical rollup: per-(event_type, hour)
    fixed-bin counts SUMMED up to the day grain, then p50/p95 read off
    the merged histogram — the percentile analog of
    :func:`hll_rollup_merge`, and the way percentile rollups compose
    at 100 TB (exact percentile partials don't merge; bin counts add
    losslessly, so a serving layer stores the hour histograms once and
    answers any coarser grain by summation, never rescanning the fact
    table).

    Unlike the HLL case the result is engine-exact: the binning is
    deterministic integer arithmetic, so the day-level histogram — and
    therefore the bin-resolution percentiles (lower edge of the bin
    where the cumulative count crosses ``ceil(q*n)``) — has a
    bit-exact DuckDB oracle, not just a bounded-error check.

    Scale shape: one groupBy to hour partials (map-side combinable),
    one groupBy summing partials to day (input = #hours x #types x
    <=B rows, not the fact table), and the percentile scan is a window
    over <= HIST_BINS rows per (type, day) — a bounded spine, never
    data-proportional.
    """
    b = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(HIST_LO)) / F.lit(HIST_W)),
            F.lit(0),
        ),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    partials = (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            b.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # bucket is a DATE (not midnight timestamp): DuckDB's
    # date_trunc('day') yields DATE, and emitting the same type keeps
    # strict collect()-level comparisons clean, not just the driver's
    # midnight-tolerant hash
    day = partials.groupBy(
        "event_type",
        F.to_date(F.col("h")).alias("bucket"),
        "bin",
    ).agg(F.sum("cnt").alias("cnt"))
    w_cum = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type", "bucket")
    cum = day.select(
        "event_type",
        "bucket",
        "bin",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_tot).alias("n"),
    )
    # integer rank thresholds k_q = ceil(q*n), via the positive-only
    # identity ceil(a/b) = (a + b - 1) div b — keeps both engines in
    # exact BIGINT arithmetic and away from trunc-vs-floor divergence
    k50 = F.expr("(n + 1) div 2")
    k95 = F.expr("(19 * n + 19) div 20")
    edge = lambda: F.lit(HIST_LO) + F.col("bin").cast("double") * F.lit(HIST_W)  # noqa: E731
    return cum.groupBy("event_type", "bucket").agg(
        F.max("n").alias("n_values"),
        F.min(F.when(F.col("cum") >= k50, edge())).alias("p50_lo"),
        F.min(F.when(F.col("cum") >= k95, edge())).alias("p95_lo"),
    )


#: Kept points per hour partial in the rank-sampled quantile sketch:
#: every ceil(n_h/QSK_CAP)-th value of the hour's sorted multiset
#: (plus the max).  The deterministic rank-error envelope of any
#: merged answer is sum_h ceil(n_h/QSK_CAP) < N/QSK_CAP + #hours —
#: the KLL/t-digest contract shape with none of their randomness, so
#: the whole pipeline keeps a bit-exact DuckDB oracle.
QSK_CAP = 256


def hour_quantile_partials(
    events: DataFrame, cap: int = QSK_CAP
) -> DataFrame:
    """The mergeable ARBITRARY-quantile partial: per (event_type,
    hour), the rank-sampled compression of the hour's sorted values —
    kept ranks r ∈ {1, s+1, 2s+1, …} ∪ {n_h} with s = ceil(n_h/cap),
    each carrying the exact count of ranks it closes
    (w = r − previous kept rank, so per-hour weights sum to n_h
    EXACTLY).  ≤ cap+1 rows per hour whatever the hour's volume.

    This is the quantile sibling of :func:`hll_rollup_merge`'s minute
    sketches and the ANY-q upgrade of the fixed-bin
    :func:`histogram_rollup_percentiles` partial: bin edges are data
    values, so resolution follows the data (no domain knob), and the
    rank error of any query over merged partials is bounded by the
    per-hour sampling strides — deterministically, unlike KLL's
    randomized compaction (Karnin-Lang-Liberty 2016), which this
    deliberately trades for engine-exact reproducibility.

    Scale shape: the per-hour rank is distwindow.keyed_running_totals
    — deterministic buckets, no per-(type, hour) sort task even for a
    hot hour — and everything after the rank is a filter plus integer
    arithmetic.  The streaming twin
    (streaming/rollup.streaming_hour_quantile_partials) emits the
    IDENTICAL rows per closed hour.
    """
    from .distwindow import keyed_running_totals

    vals = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "value",
        "event_id",
    )
    ranked = keyed_running_totals(
        vals,
        ["event_type", "h"],
        ["value", "event_id"],
        rank_col="r",
        n_col="n_h",
    )
    s = f"CAST((n_h + {cap} - 1) DIV {cap} AS BIGINT)"
    return (
        ranked.withColumn("s", F.expr(s))
        .filter(F.expr("(r - 1) % s = 0 OR r = n_h"))
        .select(
            "event_type",
            "h",
            "value",
            F.expr(
                "CAST(CASE WHEN r = 1 THEN 1"
                " WHEN (r - 1) % s = 0 THEN s"
                " ELSE (r - 1) % s END AS BIGINT)"
            ).alias("w"),
        )
    )


def quantile_sketch_rollup(
    events: DataFrame, cap: int = QSK_CAP
) -> DataFrame:
    """Mergeable-quantile hierarchical rollup: hour partials
    (:func:`hour_quantile_partials`) merged to the day grain, then
    p50/p95 read off the merged weighted spine — the arbitrary-q
    percentile analog of :func:`hll_rollup_merge`.  A serving layer
    stores the ≤ cap+1-row hour partials once and answers ANY
    quantile at ANY coarser grain by weight summation, never
    rescanning facts; the answer's rank error is < N/cap + #merged
    partials (deterministic — see the partial's docstring), while n
    itself is EXACT because the weights telescope.

    Every step is integer/IEEE-deterministic, so unlike HLL the
    estimates themselves are hash-matched by a DuckDB oracle, and the
    error envelope is pinned separately by
    tests/test_quantile_sketch.py.

    Scale shape: one fact-table pass into partials; the day merge
    groups ≤ 24·(cap+1) rows per (type, day) and the quantile read is
    a window over that bounded spine — nothing downstream of the
    first aggregate is data-proportional (histogram_rollup's plan,
    with data-adaptive edges).
    """
    pts = (
        hour_quantile_partials(events, cap)
        .groupBy(
            "event_type", F.to_date(F.col("h")).alias("bucket"), "value"
        )
        .agg(F.sum("w").alias("w"))
    )
    w_cum = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type", "bucket")
    cum = pts.select(
        "event_type",
        "bucket",
        "value",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_tot).alias("n"),
    )
    # same exact BIGINT rank thresholds as histogram_rollup:
    # k_q = ceil(q*n) via (a + b - 1) div b
    k50 = F.expr("(n + 1) DIV 2")
    k95 = F.expr("(19 * n + 19) DIV 20")
    return cum.groupBy("event_type", "bucket").agg(
        F.max("n").alias("n_values"),
        F.min(F.when(F.col("cum") >= k50, F.col("value"))).alias(
            "p50_est"
        ),
        F.min(F.when(F.col("cum") >= k95, F.col("value"))).alias(
            "p95_est"
        ),
    )


def last_event_time(df: DataFrame, metric: str) -> DataFrame:
    """G5 — ungrouped MAX with COALESCE default
    (machine_dashboard.json:948 ``last_running`` CTE)."""
    return df.filter(F.col("metric") == metric).agg(
        F.coalesce(
            F.max("time"), F.to_timestamp(F.lit("1970-01-01"))
        ).alias("clear_time")
    )


def q_rollup_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return machine_stats(telemetry(spark, sf_dir), "minute")


def q_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return machine_stats(telemetry(spark, sf_dir), "hour")


def q_last_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_event_time(telemetry(spark, sf_dir), "signup")


def q_rollup_hourly_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour rollup built from minute PARTIALS, not raw rows — must be
    bit-identical to the direct hourly rollup (shares its oracle)."""
    return combine_partials(
        machine_stats_partials(telemetry(spark, sf_dir), "minute"), "hour"
    )


def q_rollup_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return machine_stats_sliding(telemetry(spark, sf_dir))


def q_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import load_table

    return histogram_rollup_percentiles(load_table(spark, sf_dir, "events"))


def q_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import load_table

    return hll_rollup_merge(load_table(spark, sf_dir, "events"))


QUERIES = {
    "rollup_minute": q_rollup_minute,
    "rollup_hourly": q_rollup_hourly,
    "rollup_hourly_hierarchical": q_rollup_hourly_hierarchical,
    "rollup_sliding": q_rollup_sliding,
    "last_running_time": q_last_running,
    "hll_rollup_merge": q_hll_rollup_merge,
    "sliding_wau_sketch": lambda spark, sf: sliding_wau_sketch(
        load_table(spark, sf, "events")
    ),
    "histogram_rollup_percentiles": q_histogram_rollup,
    "quantile_sketch_rollup": lambda spark, sf: quantile_sketch_rollup(
        load_table(spark, sf, "events")
    ),
}

ORACLES = {
    "rollup_minute": _machine_stats_sql("minute"),
    "rollup_hourly": _machine_stats_sql("hour"),
    # the hierarchical path must reproduce the direct hourly rollup
    "rollup_hourly_hierarchical": _machine_stats_sql("hour"),
    "rollup_sliding": _SLIDING_SQL.format(telemetry=TELEMETRY_SQL),
    "last_running_time": f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT COALESCE(MAX("time"), TIMESTAMP '1970-01-01') AS clear_time
FROM telemetry WHERE metric = 'signup'
""",
    # exact hourly distinct hash-matched; merged sketch estimate
    # bounded (merge_ok must be TRUE for every bucket)
    "sliding_wau_sketch": f"""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT d.day AS end_day,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_wau,
       TRUE AS wau_ok
FROM days d
JOIN events e
  ON CAST(e.ts AS DATE) BETWEEN d.day - {WAU_WINDOW_DAYS - 1} AND d.day
GROUP BY 1
""",
    "hll_rollup_merge": """
SELECT event_type,
       date_trunc('hour', ts) AS bucket,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS merge_ok
FROM events
GROUP BY 1, 2
""",
    "histogram_rollup_percentiles": """
WITH bins AS (
  SELECT event_type,
         date_trunc('day', ts) AS bucket,
         CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 4.0), 0), 255) AS INTEGER)
           AS bin,
         COUNT(*) AS cnt
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2, 3
),
cum AS (
  SELECT event_type, bucket, bin,
         SUM(cnt) OVER (PARTITION BY event_type, bucket ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type, bucket) AS n
  FROM bins
)
SELECT event_type, bucket,
       CAST(MAX(n) AS BIGINT) AS n_values,
       MIN(CASE WHEN cum >= (n + 1) // 2
                THEN 0.0 + bin * 4.0 END) AS p50_lo,
       MIN(CASE WHEN cum >= (19 * n + 19) // 20
                THEN 0.0 + bin * 4.0 END) AS p95_lo
FROM cum
GROUP BY 1, 2
""",
    # the rank-sampled quantile sketch is deterministic end to end, so
    # the oracle replays the SAME construction: per-hour ranks, kept
    # ranks {1, s+1, …} ∪ {n_h} with exact gap weights, day merge,
    # ceil-rank quantile read — a bit-exact hash match, not an
    # envelope check (the envelope is pinned in pytest)
    "quantile_sketch_rollup": f"""
WITH v AS (
  SELECT event_type, date_trunc('hour', ts) AS h, value, event_id
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, h, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, h
                            ORDER BY value, event_id) AS r,
         COUNT(*) OVER (PARTITION BY event_type, h) AS n_h
  FROM v
),
kept AS (
  SELECT event_type, CAST(h AS DATE) AS bucket, value,
         CASE WHEN r = 1 THEN 1
              WHEN (r - 1) % s = 0 THEN s
              ELSE (r - 1) % s END AS w
  FROM (SELECT *, (n_h + {QSK_CAP} - 1) // {QSK_CAP} AS s FROM r)
  WHERE (r - 1) % s = 0 OR r = n_h
),
pts AS (
  SELECT event_type, bucket, value, SUM(w) AS w
  FROM kept GROUP BY 1, 2, 3
),
cum AS (
  SELECT event_type, bucket, value,
         SUM(w) OVER (PARTITION BY event_type, bucket ORDER BY value) AS cum,
         SUM(w) OVER (PARTITION BY event_type, bucket) AS n
  FROM pts
)
SELECT event_type, bucket,
       CAST(MAX(n) AS BIGINT) AS n_values,
       MIN(CASE WHEN cum >= (n + 1) // 2 THEN value END) AS p50_est,
       MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN value END) AS p95_est
FROM cum
GROUP BY 1, 2
""",
}

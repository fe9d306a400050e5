"""Rolling z-score anomaly detection over the event stream.

The statistical upgrade of the reference's fixed-threshold alarms
(opcua_server/main.py:24,31-39 hard-codes "3 consecutive >2%"): flag
a value against the *trailing distribution* of its own key instead of
a constant.  One window pass per key — the same shuffle the alarm
operators already pay — with the frame statistics computed from
decimal-exact sums so the flagged set is engine-deterministic:

* ``SUM(value)`` and ``SUM(value²)`` over the trailing frame as
  DECIMAL(28,6) — associative, partition-order-free — cast to double
  once;
* variance via the textbook ``(Σx² − (Σx)²/n)/(n−1)`` on those
  identical doubles (stock ``stddev_samp`` streams in engine-specific
  order and never hash-matches);
* warm-up guard: no verdict until the frame holds ``MIN_SAMPLES``
  rows.

De-skew: event_type has ~5 distinct values, so a bare
``Window.partitionBy(event_type)`` would sort ~1/5 of the fact table
in ONE task at any scale even though the frame itself is bounded.
The frame statistics therefore run through
:mod:`distwindow.bounded_frame_apply` — two-pass global per-key row
numbers, fixed 4096-row buckets, a 50-row carry at each bucket edge —
so no partition ever exceeds bucket+frame rows while the decimal-sum
frame aggregates stay bit-identical to the single-window form (the
oracle keeps the naive SQL spelling as proof).  The streaming twin is
an applyInPandasWithState ring buffer exactly like streaming/alarms.py
keeps for deviation rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .distwindow import bounded_frame_apply, trailing_frame_sums

ROLL_WINDOW = 50
MIN_SAMPLES = 30
Z_THRESHOLD = 3.0


def rolling_zscore(
    events: DataFrame,
    key_col: str = "event_type",
    n_prev: int = ROLL_WINDOW,
    min_samples: int = MIN_SAMPLES,
) -> DataFrame:
    """Per-key trailing z-score for every event (frame excludes the
    current row — the score compares now against before).  Frame
    membership counts ROWS (a NULL value occupies its slot, matching
    the SQL COUNT/SUM-over-frame spelling)."""
    dec = F.col("value").cast("decimal(28,6)")
    dec2 = (F.col("value") * F.col("value")).cast("decimal(28,6)")
    # prefix-difference trailing sums (O(1)/row) instead of the
    # re-aggregated -50..-1 frame (O(frame)/row — measured 5.8 s warm
    # at sf0.1 vs ~1.5 s on this spelling); exact decimal subtraction,
    # value-identical to the window form the oracle keeps
    framed = trailing_frame_sums(
        events.select("event_id", "ts", key_col, "value"),
        key_cols=[key_col],
        order_cols=["ts", "event_id"],
        n_prev=n_prev,
        sums={"_s1d": dec, "_s2d": dec2},
    ).withColumns(
        {
            "_s1": F.col("_s1d").cast("double"),
            "_s2": F.col("_s2d").cast("double"),
        }
    )
    n = F.col("n_prev")
    mean = F.col("_s1") / n
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    return framed.select(
        "event_id",
        "ts",
        F.col(key_col).alias("key"),
        "value",
        "n_prev",
        F.when(n >= min_samples, mean).alias("roll_mean"),
        F.when(n >= min_samples, z).alias("zscore"),
    )


def zscore_anomalies(
    events: DataFrame, threshold: float = Z_THRESHOLD
) -> DataFrame:
    scored = rolling_zscore(events)
    return scored.filter(
        F.abs(F.col("zscore")) > threshold
    ).select("event_id", "ts", "key", "value", "roll_mean", "zscore")


WINSOR_LO = 0.01
WINSOR_HI = 0.99


def winsorized_values(
    events: DataFrame, lo: float = WINSOR_LO, hi: float = WINSOR_HI
) -> DataFrame:
    """Winsorization: clamp each key's values to its own [p01, p99] —
    the robust-stats companion to z-score flagging (downstream
    aggregates stop being hostage to a sensor spike).  Per-key exact
    percentiles are a #keys-row aggregate broadcast back over the
    stream; Spark ``percentile`` and other type-7 implementations
    agree bit-for-bit, so the clamped values are engine-exact."""
    bounds = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(lo)).alias("p_lo"),
        F.percentile("value", F.lit(hi)).alias("p_hi"),
    )
    return (
        events.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
            .alias("winsorized"),
            (
                (F.col("value") < F.col("p_lo"))
                | (F.col("value") > F.col("p_hi"))
            ).alias("clipped"),
        )
    )


# CUSUM (Page 1954) tabular change-point detection: the sequential
# upgrade of the z-score flagger — a z-score sees one outlier at a
# time, CUSUM accumulates SMALL persistent drifts until they become
# undeniable.  The textbook recursion
#
#   s_t = max(0, s_{t-1} + (x_t - target - slack))
#
# looks inherently sequential, but it has a closed prefix form
#
#   s_t = P_t - min(0, min_{j<=t} P_j),   P_t = Σ_{i<=t} d_i
#
# (the clamp-at-zero restart is "measure drift from the best point so
# far"), which is two window aggregates — a running sum and a running
# min — so Catalyst executes it as ONE sort per key with no Python in
# the loop.  All arithmetic is exact BIGINT micro-units (the
# DECIMAL(28,6) x 1e6 scaling proven in metric_pair_correlation), so
# the alarm set is engine-deterministic, not a float race.
#
# De-skew (the hyperfunctions (key, day) two-pass): the running
# sum/min windows run inside (event_type, day) partitions; a tiny
# per-(key, day) boundary table carries each day's total drift and
# adjusted running-min prefix, so the global prefix statistics are
# reconstructed bit-identically (tests/test_cusum.py pins the
# single-window equivalence) while no task ever sorts more than one
# key's single day.

#: slack (allowance) = target/SLACK_DIV — drift smaller than this per
#: sample is ignored; threshold h = target * H_MULT.
CUSUM_SLACK_DIV = 10
CUSUM_H_MULT = 20

_X_MICRO = "CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT)"


def cusum_scores(
    events: DataFrame,
    slack_div: int = CUSUM_SLACK_DIV,
) -> DataFrame:
    """Per-row two-sided CUSUM statistics (exact BIGINT micro-units).

    ``target`` is the key's own mean in micro-units (truncating
    integer division — values are non-negative by domain, where trunc
    and floor agree); ``slack = target DIV slack_div``.  High side
    accumulates ``x - target - slack``, low side ``target - slack - x``.
    """
    x = (
        events.filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("key"),
            "ts",
            "event_id",
            F.expr(_X_MICRO).alias("x"),
            F.to_date("ts").alias("_day"),
        )
    )
    # truncating integer DIV (Spark DIV ≡ DuckDB // on non-negatives)
    target = x.groupBy("key").agg(
        F.expr("SUM(x) DIV COUNT(*)").alias("target")
    )
    scored = x.join(F.broadcast(target), "key").withColumn(
        "slack", F.expr(f"target DIV {slack_div}")
    )
    d_hi = F.col("x") - F.col("target") - F.col("slack")
    d_lo = F.col("target") - F.col("slack") - F.col("x")
    scored = scored.withColumn("d_hi", d_hi).withColumn("d_lo", d_lo)

    w_run = (
        Window.partitionBy("key", "_day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        scored.withColumn("p_hi", F.sum("d_hi").over(w_run))
        .withColumn("p_lo", F.sum("d_lo").over(w_run))
        .withColumn("m_hi", F.min(F.col("p_hi")).over(w_run))
        .withColumn("m_lo", F.min(F.col("p_lo")).over(w_run))
    )
    # tiny boundary table: per (key, day) total drift and local min
    bounds = local.groupBy("key", "_day").agg(
        F.sum("d_hi").alias("dsum_hi"),
        F.sum("d_lo").alias("dsum_lo"),
        F.min("p_hi").alias("lmin_hi"),
        F.min("p_lo").alias("lmin_lo"),
    )
    w_days_prev = (
        Window.partitionBy("key")
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = (
        bounds.withColumn(
            "off_hi", F.coalesce(F.sum("dsum_hi").over(w_days_prev), F.lit(0))
        )
        .withColumn(
            "off_lo", F.coalesce(F.sum("dsum_lo").over(w_days_prev), F.lit(0))
        )
        .withColumn(
            "prevmin_hi",
            F.min(F.col("off_hi") + F.col("lmin_hi")).over(w_days_prev),
        )
        .withColumn(
            "prevmin_lo",
            F.min(F.col("off_lo") + F.col("lmin_lo")).over(w_days_prev),
        )
        .select(
            "key", "_day", "off_hi", "off_lo", "prevmin_hi", "prevmin_lo"
        )
    )
    g = local.join(F.broadcast(bounds), ["key", "_day"])
    gp_hi = F.col("off_hi") + F.col("p_hi")
    gp_lo = F.col("off_lo") + F.col("p_lo")
    gm_hi = F.least(
        F.coalesce(F.col("prevmin_hi"), F.col("off_hi") + F.col("m_hi")),
        F.col("off_hi") + F.col("m_hi"),
    )
    gm_lo = F.least(
        F.coalesce(F.col("prevmin_lo"), F.col("off_lo") + F.col("m_lo")),
        F.col("off_lo") + F.col("m_lo"),
    )
    return g.select(
        "key",
        "ts",
        "event_id",
        "x",
        "target",
        "slack",
        (gp_hi - F.least(F.lit(0), gm_hi)).alias("cusum_high"),
        (gp_lo - F.least(F.lit(0), gm_lo)).alias("cusum_low"),
    )


def cusum_changepoints(
    events: DataFrame,
    slack_div: int = CUSUM_SLACK_DIV,
    h_mult: int = CUSUM_H_MULT,
) -> DataFrame:
    """Per-key CUSUM summary: alarm counts on both sides against
    ``h = target * h_mult``, peak statistics, first alarm times —
    one row per key, every column exact."""
    s = cusum_scores(events, slack_div)
    h = F.col("target") * F.lit(h_mult)
    hi = F.col("cusum_high") > h
    lo = F.col("cusum_low") > h
    return s.groupBy("key", "target", "slack").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(hi.cast("bigint")).alias("n_high_alarms"),
        F.sum(lo.cast("bigint")).alias("n_low_alarms"),
        F.max("cusum_high").alias("max_cusum_high"),
        F.max("cusum_low").alias("max_cusum_low"),
        F.min(F.when(hi, F.col("ts"))).alias("first_high_ts"),
        F.min(F.when(lo, F.col("ts"))).alias("first_low_ts"),
    )


# Hampel filter (rolling-median despiking): the robust companion to
# the rolling z-score — mean/stddev frames are dragged by the very
# spike they should flag; median/MAD frames are not.  Classic sensor
# de-noising (Hampel 1974; the `hampel` family in industrial
# timeseries toolkits): flag x when |x - med| > k * 1.4826 * MAD over
# a centered ±HAMPEL_HALF-row frame, repair by the median.
#
# Exactness: all order statistics run in integer micro-units with the
# DOUBLED-value trick — a median of integers is a half-integer, so
# med2 = 2*median and mad4 = 4*MAD are exact BIGINTs, and the flag
# test |x - med| > 3 * 1.4826 * MAD (i.e. D/2 > 44478/40000 * mad4/4
# with D = |2x - med2|) becomes the integer comparison
# 20000 * D > 44478 * mad4 — no float enters the decision.
# The repaired value (med2 / 2.0) and mad (mad4 / 4.0) are power-of-
# two divides: exact doubles on both engines.
#
# Scale shape: same de-skewed bounded-frame pass as rolling_zscore
# (distwindow.bounded_frame_apply): ±3 centered frame = 3-row carries
# at BOTH bucket edges, partitions bounded by bucket+6 rows regardless
# of key cardinality.  array_sort normalizes the collected frame, so
# the result is bit-identical to the single-window oracle spelling.

HAMPEL_HALF = 3  # frame = 3 before + current + 3 after
HAMPEL_K_NUM = 44478  # 3 * 1.4826 scaled by 10^4
HAMPEL_X_NUM = 20000  # (4/2) * 10^4: cancels dev doubling vs mad4 quartering


def _med2(sorted_arr):
    """2x the median of a sorted int array, as an exact BIGINT."""
    n = F.size(sorted_arr)
    odd = n % 2 == 1
    mid = F.element_at(sorted_arr, ((n + 1) / 2).cast("int"))
    lo = F.element_at(sorted_arr, (n / 2).cast("int"))
    hi = F.element_at(sorted_arr, (n / 2 + 1).cast("int"))
    return F.when(odd, 2 * mid).otherwise(lo + hi)


def hampel_despike(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key centered rolling-median spike repair (see module
    comment for the exact-integer formulation)."""
    x = F.expr(_X_MICRO)
    framed = bounded_frame_apply(
        events.filter(F.col("value").isNotNull()).select(
            "event_id", "ts", key_col, "value", x.alias("x")
        ),
        key_cols=[key_col],
        order_cols=["ts", "event_id"],
        lo=-HAMPEL_HALF,
        hi=HAMPEL_HALF,
        exprs={
            "_arr": lambda w: F.array_sort(F.collect_list("x").over(w))
        },
    ).select(
        "event_id",
        "ts",
        F.col(key_col).alias("key"),
        "value",
        "x",
        "_arr",
    )
    framed = framed.withColumn("_med2", _med2(F.col("_arr")))
    devs = F.array_sort(
        F.transform(
            F.col("_arr"), lambda e: F.abs(2 * e - F.col("_med2"))
        )
    )
    framed = framed.withColumn("_mad4", _med2(devs))
    is_spike = (
        F.lit(HAMPEL_X_NUM) * F.abs(2 * F.col("x") - F.col("_med2"))
        > F.lit(HAMPEL_K_NUM) * F.col("_mad4")
    )
    # value-unit outputs: int → double (correctly rounded), power-of-
    # two divide (exact), then ONE division by 1e6 — identical op
    # order in the oracle, so every float is bit-identical
    med_val = F.col("_med2").cast("double") / F.lit(2.0) / F.lit(1e6)
    mad_val = F.col("_mad4").cast("double") / F.lit(4.0) / F.lit(1e6)
    return framed.select(
        "event_id",
        "ts",
        "key",
        "value",
        med_val.alias("roll_median"),
        mad_val.alias("roll_mad"),
        is_spike.alias("is_spike"),
        F.when(is_spike, med_val).otherwise(F.col("value")).alias("repaired"),
    )


# Seasonal-profile anomaly detection: the calendar-aware upgrade of
# the rolling z-score.  A trailing frame adapts to drift but is blind
# to PERIODIC structure — a reading that is normal at 14:00 may be a
# fault at 03:00, and a trailing window spanning both hours averages
# the two regimes together.  The classic fix (seasonal naive / hour-
# of-day profiling, the degenerate-but-robust corner of STL) scores
# each sample against the historical distribution of its OWN calendar
# slot: profile = (metric, hour-of-day) -> mean/variance over all
# history, flag |x - mean| > k * sigma.
#
# Scale shape (the two-pass broadcast pattern, cf. winsorized_values):
# pass 1 is ONE map-side-combinable shuffle collapsing the fact table
# to #metrics x 24 profile rows; pass 2 broadcast-joins the profile
# back, so the 100 TB fact table is never shuffled and no per-key sort
# exists anywhere (unlike the rolling z-score's window pass).  Exact-
# ness: the profile moments are the module's decimal-sum spellings
# (associative, partition-order-free), so mean/variance — and hence
# the flagged set — are bit-identical across engines.

SEASONAL_MIN_SAMPLES = 30
SEASONAL_Z = 2.5


def seasonal_profile(telemetry_df: DataFrame) -> DataFrame:
    """(metric, hour-of-day) -> n, exact mean, exact variance."""
    x = telemetry_df.filter(F.col("value_num").isNotNull()).select(
        "metric",
        F.hour("time").alias("hod"),
        F.col("value_num").alias("x"),
    )
    dec = F.col("x").cast("decimal(28,6)")
    dec2 = (F.col("x") * F.col("x")).cast("decimal(28,6)")
    prof = x.groupBy("metric", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec2).cast("double").alias("s2"),
    )
    n = F.col("n")
    s1 = F.col("s1")
    mean = s1 / n
    var = (F.col("s2") - s1 * s1 / n) / (n - 1)
    return prof.select(
        "metric", "hod", "n", mean.alias("hod_mean"), var.alias("hod_var")
    )


def seasonal_anomalies(
    telemetry_df: DataFrame,
    z_threshold: float = SEASONAL_Z,
    min_samples: int = SEASONAL_MIN_SAMPLES,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Rows deviating > ``z_threshold`` sigma from their (metric,
    hour-of-day) seasonal slot.  Slots ABSTAIN when they hold
    < ``min_samples`` history or when their variance is not strictly
    positive: a constant slot has hod_var = 0 (or a tiny negative
    from float cancellation of s2 - s1²/n), which would make z ±Inf/
    NaN — both engines order NaN/Inf above the threshold, so without
    the guard every row of a flat signal flags as anomalous.

    ``profile`` defaults to self-training on the scored frame (the
    batch/backfill shape); pass a frozen :func:`seasonal_profile` to
    score a LIVE STREAM against trained seasonality — the scoring path
    is a stateless narrow projection plus a stream-static broadcast
    join, so the same code serves both (streaming/anomaly.py twin).
    The two sides are explicitly aliased: the self-trained profile
    shares the fact table's lineage, and an unaliased equi-join on it
    makes Catalyst warn about trivially-true predicates on every run.
    """
    prof = (seasonal_profile(telemetry_df) if profile is None else profile).alias(
        "p"
    )
    fact = telemetry_df.filter(F.col("value_num").isNotNull()).alias("f")
    scored = fact.join(
        F.broadcast(prof),
        (F.col("f.metric") == F.col("p.metric"))
        & (F.hour(F.col("f.time")) == F.col("p.hod")),
    )
    z = (F.col("value_num") - F.col("hod_mean")) / F.sqrt(F.col("hod_var"))
    return (
        scored.filter(
            (F.col("n") >= min_samples)
            & (F.col("hod_var") > 0)
            & (F.abs(z) > z_threshold)
        )
        .select(
            "event_id",
            F.col("f.metric").alias("metric"),
            "time",
            "value_num",
            "hod",
            "hod_mean",
            z.alias("zscore"),
        )
    )


# Quantized-weight EWMA smoothing: the classic recursive filter
# s_t = a*x_t + (1-a)*s_{t-1} looks sequential, but industrial
# practice (pandas ewm(adjust=True)) uses the equivalent finite form
#
#   s_t = Σ_j (1-a)^j x_{t-j} / Σ_j (1-a)^j
#
# whose tail weights vanish geometrically — at K=32 taps and a=0.2
# the truncation error is (1-a)^32 < 8e-4 of one sample, i.e. the
# operator is DEFINED here as the K-tap adjusted EWMA.  The weights
# are QUANTIZED to integers (round((1-a)^j * 1e6)) precomputed in
# Python and embedded as literals in BOTH engines, so the whole
# numerator/denominator is exact BIGINT arithmetic — no pow(), no
# float fold, no engine-specific libm — and only ONE double division
# at the end.  Bound: |value| <= ~2.8e5 keeps the 32-term sum inside
# int64 (driver events are <= ~600).
#
# De-skew: the K-row trailing frame runs through
# distwindow.bounded_frame_apply like rolling_zscore; the frame list
# arrives oldest->newest (window frame order on both engines), and
# the weights are applied positionally from the newest end.

EWMA_ALPHA = 0.2
EWMA_TAPS = 32
_EWMA_W = [round((1 - EWMA_ALPHA) ** j * 10**6) for j in range(EWMA_TAPS)]
_EWMA_D = [sum(_EWMA_W[: m + 1]) for m in range(EWMA_TAPS)]


def ewma_smooth(
    events: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Per-key K-tap adjusted EWMA (see block comment: integer-exact
    quantized weights, one trailing de-skewed frame pass)."""
    x = F.expr(_X_MICRO)
    framed = bounded_frame_apply(
        events.filter(F.col("value").isNotNull()).select(
            "event_id", "ts", key_col, "value", x.alias("x")
        ),
        key_cols=[key_col],
        order_cols=["ts", "event_id"],
        lo=-(EWMA_TAPS - 1),
        hi=0,
        exprs={"_arr": lambda w: F.collect_list("x").over(w)},
    )
    m = F.size("_arr")
    w_arr = F.array(*[F.lit(w).cast("long") for w in _EWMA_W])
    d_arr = F.array(*[F.lit(d).cast("long") for d in _EWMA_D])
    # newest-first, so weight i pairs with the i-th most recent sample
    prods = F.zip_with(
        F.reverse(F.col("_arr")),
        F.slice(w_arr, 1, m),
        lambda xi, wi: xi * wi,
    )
    num = F.aggregate(
        prods, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    denom = F.element_at(d_arr, m)
    ewma = (
        num.cast("double") / denom.cast("double") / F.lit(1e6)
    )
    return framed.select(
        "event_id",
        "ts",
        F.col(key_col).alias("key"),
        "value",
        m.alias("n_taps"),
        ewma.alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Driver-contract queries + oracles
# ---------------------------------------------------------------------------


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_zscore(load_table(spark, sf_dir, "events"))


def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ingest import telemetry

    return seasonal_anomalies(telemetry(spark, sf_dir))


def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zscore_anomalies(load_table(spark, sf_dir, "events"))


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_changepoints(load_table(spark, sf_dir, "events"))


QUERIES = {
    "rolling_zscore": q_rolling_zscore,
    "zscore_anomalies": q_zscore_anomalies,
    "winsorized_values": lambda spark, sf: winsorized_values(
        load_table(spark, sf, "events")
    ),
    "cusum_changepoints": q_cusum,
    "hampel_despike": lambda spark, sf: hampel_despike(
        load_table(spark, sf, "events")
    ),
    "seasonal_anomalies": q_seasonal_anomalies,
    "ewma_smooth": lambda spark, sf: ewma_smooth(
        load_table(spark, sf, "events")
    ),
}

_FRAME = (
    f"OVER (PARTITION BY event_type ORDER BY ts, event_id "
    f"ROWS BETWEEN {ROLL_WINDOW} PRECEDING AND 1 PRECEDING)"
)

_SCORED = f"""
SELECT event_id, ts, event_type AS key, value,
       COUNT(*) {_FRAME} AS n_prev,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) {_FRAME} AS DOUBLE) AS s1,
       CAST(SUM(CAST(value * value AS DECIMAL(28,6))) {_FRAME} AS DOUBLE) AS s2
FROM events
"""

_Z = "(value - s1 / n_prev) / sqrt((s2 - s1 * s1 / n_prev) / (n_prev - 1))"

ORACLES = {
    "rolling_zscore": f"""
SELECT event_id, ts, key, value, n_prev,
       CASE WHEN n_prev >= {MIN_SAMPLES} THEN s1 / n_prev END AS roll_mean,
       CASE WHEN n_prev >= {MIN_SAMPLES} THEN {_Z} END AS zscore
FROM ({_SCORED})
""",
    "zscore_anomalies": f"""
SELECT event_id, ts, key, value, s1 / n_prev AS roll_mean, {_Z} AS zscore
FROM ({_SCORED})
WHERE n_prev >= {MIN_SAMPLES} AND abs({_Z}) > {Z_THRESHOLD}
""",
    "winsorized_values": f"""
WITH b AS (
  SELECT event_type,
         quantile_cont(value, {WINSOR_LO}) AS p_lo,
         quantile_cont(value, {WINSOR_HI}) AS p_hi
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       LEAST(GREATEST(value, p_lo), p_hi) AS winsorized,
       (value < p_lo OR value > p_hi) AS clipped
FROM events e JOIN b ON e.event_type = b.event_type
""",
    "cusum_changepoints": f"""
WITH x AS (
  SELECT event_type AS key, ts, event_id,
         {_X_MICRO} AS x
  FROM events WHERE value IS NOT NULL
),
tgt AS (
  SELECT key, CAST(SUM(x) // COUNT(*) AS BIGINT) AS target
  FROM x GROUP BY key
),
s AS (
  SELECT x.key, x.ts, x.event_id, x.x, t.target,
         t.target // {CUSUM_SLACK_DIV} AS slack,
         x.x - t.target - (t.target // {CUSUM_SLACK_DIV}) AS d_hi,
         t.target - (t.target // {CUSUM_SLACK_DIV}) - x.x AS d_lo
  FROM x JOIN tgt t ON x.key = t.key
),
p AS (
  SELECT *, SUM(d_hi) OVER w AS p_hi, SUM(d_lo) OVER w AS p_lo
  FROM s
  WINDOW w AS (PARTITION BY key ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
m AS (
  SELECT *, MIN(p_hi) OVER w AS m_hi, MIN(p_lo) OVER w AS m_lo
  FROM p
  WINDOW w AS (PARTITION BY key ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
c AS (
  SELECT key, ts, target, slack,
         p_hi - LEAST(0, m_hi) AS cusum_high,
         p_lo - LEAST(0, m_lo) AS cusum_low
  FROM m
)
SELECT key, target, slack,
       COUNT(*) AS n_samples,
       CAST(SUM(CASE WHEN cusum_high > target * {CUSUM_H_MULT}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_alarms,
       CAST(SUM(CASE WHEN cusum_low > target * {CUSUM_H_MULT}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low_alarms,
       CAST(MAX(cusum_high) AS BIGINT) AS max_cusum_high,
       CAST(MAX(cusum_low) AS BIGINT) AS max_cusum_low,
       MIN(CASE WHEN cusum_high > target * {CUSUM_H_MULT} THEN ts END)
         AS first_high_ts,
       MIN(CASE WHEN cusum_low > target * {CUSUM_H_MULT} THEN ts END)
         AS first_low_ts
FROM c
GROUP BY key, target, slack
""",
    "hampel_despike": f"""
WITH framed AS (
  SELECT event_id, ts, event_type AS key, value,
         {_X_MICRO} AS x,
         list_sort(list({_X_MICRO})
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN {HAMPEL_HALF} PRECEDING
                          AND {HAMPEL_HALF} FOLLOWING)) AS arr
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT *,
         CASE WHEN len(arr) % 2 = 1 THEN 2 * arr[(len(arr) + 1) // 2]
              ELSE arr[len(arr) // 2] + arr[len(arr) // 2 + 1] END AS med2
  FROM framed
),
mad AS (
  SELECT *, list_sort(list_transform(arr, e -> abs(2 * e - med2))) AS devs
  FROM med
),
scored AS (
  SELECT *,
         CASE WHEN len(devs) % 2 = 1 THEN 2 * devs[(len(devs) + 1) // 2]
              ELSE devs[len(devs) // 2] + devs[len(devs) // 2 + 1] END AS mad4
  FROM mad
)
SELECT event_id, ts, key, value,
       CAST(med2 AS DOUBLE) / 2.0 / 1000000.0 AS roll_median,
       CAST(mad4 AS DOUBLE) / 4.0 / 1000000.0 AS roll_mad,
       {HAMPEL_X_NUM} * abs(2 * x - med2) > {HAMPEL_K_NUM} * mad4 AS is_spike,
       CASE WHEN {HAMPEL_X_NUM} * abs(2 * x - med2) > {HAMPEL_K_NUM} * mad4
            THEN CAST(med2 AS DOUBLE) / 2.0 / 1000000.0
            ELSE value END AS repaired
FROM scored
""",
}


_EWMA_W_SQL = "[" + ", ".join(str(w) for w in _EWMA_W) + "]"
_EWMA_D_SQL = "[" + ", ".join(str(d) for d in _EWMA_D) + "]"

ORACLES["ewma_smooth"] = f"""
WITH framed AS (
  SELECT event_id, ts, event_type AS key, value,
         list({_X_MICRO})
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN {EWMA_TAPS - 1} PRECEDING
                          AND CURRENT ROW) AS arr
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, ts, key, value,
       CAST(len(arr) AS INT) AS n_taps,
       CAST(list_sum(list_transform(range(1, len(arr) + 1),
              i -> arr[len(arr) - i + 1] * ({_EWMA_W_SQL})[i]))
            AS DOUBLE)
       / CAST(({_EWMA_D_SQL})[len(arr)] AS DOUBLE) / 1000000.0 AS ewma
FROM framed
"""


def _seasonal_oracle() -> str:
    from .ingest import TELEMETRY_SQL

    return f"""
WITH telemetry AS ({TELEMETRY_SQL}),
prof AS (
  SELECT metric, hour("time") AS hod,
         COUNT(*) AS n,
         CAST(SUM(CAST(value_num AS DECIMAL(28,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value_num * value_num AS DECIMAL(28,6))) AS DOUBLE)
           AS s2
  FROM telemetry WHERE value_num IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_id, t.metric, t."time", t.value_num, p.hod,
       s1 / n AS hod_mean,
       (value_num - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS zscore
FROM telemetry t
JOIN prof p ON t.metric = p.metric AND hour(t."time") = p.hod
WHERE t.value_num IS NOT NULL
  AND p.n >= {SEASONAL_MIN_SAMPLES}
  AND (s2 - s1 * s1 / n) / (n - 1) > 0
  AND abs((value_num - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)))
      > {SEASONAL_Z}
"""


ORACLES["seasonal_anomalies"] = _seasonal_oracle()

"""Alarm / deviation detection (SURVEY.md §2.6 W3-W5, §2.3 P13, §2.9 F9).

In the reference these run *inside the simulator* as mutable per-key
state (opcua_server/main.py:14-40,319-332,374-434); here they are
first-class operators over the telemetry — batch forms via window
functions (this module), streaming forms via keyed state
(:mod:`..streaming.alarms`).

Batch formulations are window functions DE-SKEWED for low-cardinality
keys (the driver surface partitions on metric/operator — a handful of
values, so a bare per-key window would sort a fixed fraction of the
fact table in ONE task at any scale): the trailing frames run through
:func:`distwindow.bounded_frame_apply` (bucketed global row numbers +
edge carries), the unbounded latch through
:func:`distwindow.keyed_prefix_last` (associative LOCF two-pass).  No
driver-side state exists; the oracles keep the naive single-window
SQL spellings, so the driver's hash compare re-proves the
decompositions on every run.

Semantics pinned from the reference:

* W3 DeviationTracker (opcua_server/main.py:26-40): per key, deviation
  pct = (actual-target)/target*100 with a target==0 guard (:29-30);
  3-deep ring buffer (:33-34); rule 1 ``|pct|>10`` checked BEFORE
  rule 2 ``3 consecutive |pct|>2`` (elif at :37) — rule 2 only fires
  when the current sample is not itself a rule-1 hit.
* W4 edge detection (opcua_server/main.py:319-332): alarms fire on the
  *transition* below a threshold (per-key state flag), not on level.
* W5 latched error (opcua_server/main.py:398-434,212-221): an error
  persists until an explicit clear event; implemented as
  last(ignoreNulls) over an unbounded preceding frame with clear
  markers encoded as empty strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .distwindow import bounded_frame_apply, keyed_prefix_last
from .ingest import TELEMETRY_SQL, telemetry

#: Fixed target for the driver-data deviation queries (the reference
#: compares Actual* vs Target* metric pairs; driver events carry one
#: value, so the target is a constant — the operator shape is the same).
#: 77 deliberately: (v-77)/77*100 over 2-decimal inputs never lands on
#: an exact binary %.2f midpoint (unlike /80, where *1.25 keeps dyadic
#: values dyadic, e.g. -10.625), so Java's HALF_UP and C printf's
#: half-even formatting agree on every value.
_TARGET = 77.0


def deviation_pct(actual: Column, target: Column) -> Column:
    """F9 — percent deviation with divide-by-zero guard
    (opcua_server/main.py:29-30: target==0 -> skip, i.e. NULL)."""
    return F.when(target != 0, (actual - target) / target * 100)


def deviation_alarms(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    target: Column | None = None,
) -> DataFrame:
    """W3 — trailing-3 deviation rules, batch form.

    Output one row per input sample that fires an alarm, with the
    reference's alarm text (opcua_server/main.py:36,38-39).
    """
    t = target if target is not None else F.lit(_TARGET)
    pct = deviation_pct(F.col("value_num"), t)
    # Guarded samples (target==0 -> NULL pct) are filtered BEFORE the
    # window: the reference returns before appending to the buffer
    # (opcua_server/main.py:29-30), so a guarded sample must not occupy
    # a slot in anyone's trailing-3 frame.  The trailing-3 frame runs
    # de-skewed; the two lags come out of the ordered frame list
    # (frame order = global order restricted to the frame, so
    # element_at(arr, 1/2) IS lag 2/1 whenever the frame is full —
    # and rule 2 only reads them when frame_n == 3).
    base = (
        df.filter(F.col("value_num").isNotNull())
        .withColumn("pct", pct)
        .filter(F.col("pct").isNotNull())
    )
    framed = bounded_frame_apply(
        base,
        key_cols=key_cols,
        order_cols=order_cols,
        lo=-2,
        hi=0,
        exprs={
            "frame_n": lambda w: F.count("pct").over(w),
            "gt2_n": lambda w: F.count(
                F.when(F.abs(F.col("pct")) > 2, 1)
            ).over(w),
            "_pcts": lambda w: F.collect_list("pct").over(w),
        },
    )
    rule1 = F.abs(F.col("pct")) > 10
    rule2 = (F.col("frame_n") == 3) & (F.col("gt2_n") == 3)
    # Rule-2 text carries ALL THREE trailing deviations oldest-first,
    # matching the reference's ', '.join over the ring buffer
    # (opcua_server/main.py:38-39).
    alarm = F.when(
        rule1,
        F.format_string("%s: Abweichung %.2f%% (>10%%)", F.col("metric"), F.col("pct")),
    ).when(
        rule2,
        F.format_string(
            "%s: 3x in Folge Abweichung >2%% (%.2f%%, %.2f%%, %.2f%%)",
            F.col("metric"),
            F.element_at("_pcts", 1),
            F.element_at("_pcts", 2),
            F.col("pct"),
        ),
    )
    return (
        framed.withColumn("alarm", alarm)
        .filter(F.col("alarm").isNotNull())
        .select(*key_cols, *order_cols, "pct", "alarm")
    )


def edge_alarms(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    threshold: float,
) -> DataFrame:
    """W4 — falling-edge detection: fire only on the transition below
    ``threshold`` (prev >= t AND cur < t), mirroring the per-feeder
    state flag at opcua_server/main.py:319-332 (reset when the value
    recovers).  lag(1) is the first element of the de-skewed (-1, 0)
    frame when that frame holds two rows."""
    framed = bounded_frame_apply(
        df.filter(F.col("value_num").isNotNull()),
        key_cols=key_cols,
        order_cols=order_cols,
        lo=-1,
        hi=0,
        exprs={"_vals": lambda w: F.collect_list("value_num").over(w)},
    )
    prev = F.when(
        F.size("_vals") == 2, F.element_at("_vals", 1)
    )
    return (
        framed.withColumn("prev_value", prev)
        .filter(
            (F.col("value_num") < threshold)
            & F.col("prev_value").isNotNull()
            & (F.col("prev_value") >= threshold)
        )
        .select(
            *key_cols,
            *order_cols,
            "value_num",
            "prev_value",
            F.format_string(
                "Info: Low Level (%.2f) - Please Refill!", F.col("value_num")
            ).alias("alarm"),
        )
    )


def latched_error(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    set_when: Column,
    clear_when: Column,
    message: Column,
) -> DataFrame:
    """W5 — value latched until reset: CurrentError persists until an
    Acknowledge/Start clears it (opcua_server/main.py:212-221,398-434).

    ``set_when`` rows latch ``message``; ``clear_when`` rows latch ''
    (the reference writes the empty string on clear, :216).

    The unbounded-preceding latch is LOCF — associative, so it runs
    through :func:`distwindow.keyed_prefix_last` instead of a bare
    per-key window (operator has a handful of values)."""
    marker = F.when(set_when, message).when(clear_when, F.lit(""))
    latched = keyed_prefix_last(
        df.withColumn("_marker", marker),
        key_cols=key_cols,
        order_cols=order_cols,
        value_col="_marker",
        out_col="_latched",
    )
    return latched.withColumn(
        "current_error", F.coalesce(F.col("_latched"), F.lit(""))
    ).drop("_marker", "_latched")


def threshold_alarms(df: DataFrame) -> DataFrame:
    """P13 — stateless threshold predicates (opcua_server/main.py:381-390
    shapes: accuracy |x|>25, vision <99, vacuum >-60, feeder <=0)."""
    return df.filter(
        F.col("value_num").isNotNull() & (F.abs(F.col("value_num") - _TARGET) > 25)
    ).select("metric", "time", "event_id", "value_num")


# Error-burst detection: "N errors within a sliding hour" — the alarm
# aggregation layer above the per-sample rules (the reference's agents
# only ever see one sample at a time; an operations dashboard pages on
# BURSTS).  Scale shape: the fact table collapses to (operator,
# 10-minute bucket) error counts in ONE map-side-combinable shuffle;
# the sliding sum then runs on that tiny bucket spine with a RANGE
# frame over the integer bucket index — gaps (empty buckets) are
# handled by the range frame itself, no gap-fill join, and the window
# partition is bounded by #buckets-per-operator (time-proportional,
# never fact-proportional — the lag-spine precedent from
# hyperfunctions).

BURST_BUCKET_SEC = 600
BURST_SPAN_BUCKETS = 6  # sliding window = 6 buckets = 1 hour
BURST_MIN_ERRORS = 30


def error_burst_windows(
    telemetry_df: DataFrame,
    span: int = BURST_SPAN_BUCKETS,
    min_errors: int = BURST_MIN_ERRORS,
) -> DataFrame:
    from pyspark.sql import Window

    bkt = F.expr(
        f"unix_micros(time) DIV {BURST_BUCKET_SEC * 1_000_000}"
    )
    counts = (
        telemetry_df.filter(
            F.col("operator").isNotNull() & (F.col("metric") == "error")
        )
        .groupBy(F.col("operator"), bkt.alias("bkt"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    w = (
        Window.partitionBy("operator")
        .orderBy("bkt")
        .rangeBetween(-(span - 1), 0)
    )
    sliding = F.sum("n_errors").over(w)
    return counts.select(
        "operator",
        F.timestamp_seconds(F.col("bkt") * BURST_BUCKET_SEC).alias(
            "bucket_start"
        ),
        "n_errors",
        sliding.alias("sliding_errors"),
        (sliding >= min_errors).alias("is_burst"),
    )


# ---------------------------------------------------------------------------
# Driver-contract queries (key = metric stream per user, ordered by time)
# ---------------------------------------------------------------------------

_KEYS = ["metric"]
_ORDER = ["time", "event_id"]


def q_deviation_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return deviation_alarms(telemetry(spark, sf_dir), _KEYS, _ORDER)


def q_edge_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return edge_alarms(
        telemetry(spark, sf_dir), ["metric", "operator"], _ORDER, 100.0
    )


def q_latched_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = telemetry(spark, sf_dir)
    out = latched_error(
        t,
        key_cols=["operator"],
        order_cols=_ORDER,
        set_when=F.col("metric") == "error",
        clear_when=F.col("metric") == "signup",
        message=F.col("value_str"),
    )
    return out.filter(F.col("operator").isNotNull()).select(
        "operator", "time", "event_id", "metric", "current_error"
    )


def q_threshold_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return threshold_alarms(telemetry(spark, sf_dir))


QUERIES = {
    "deviation_alarms": q_deviation_alarms,
    "edge_alarms": q_edge_alarms,
    "latched_error": q_latched_error,
    "threshold_alarms": q_threshold_alarms,
    "error_burst_windows": lambda spark, sf: error_burst_windows(
        telemetry(spark, sf)
    ),
}

ORACLES = {
    "deviation_alarms": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
dev AS (
  SELECT * FROM (
    SELECT metric, "time", event_id,
           CASE WHEN {_TARGET} <> 0
                THEN (value_num - {_TARGET}) / {_TARGET} * 100 END AS pct
    FROM telemetry WHERE value_num IS NOT NULL
  ) WHERE pct IS NOT NULL
),
framed AS (
  SELECT *,
         COUNT(pct) OVER w AS frame_n,
         COUNT(CASE WHEN ABS(pct) > 2 THEN 1 END) OVER w AS gt2_n,
         LAG(pct, 2) OVER wo AS pct_lag2,
         LAG(pct, 1) OVER wo AS pct_lag1
  FROM dev
  WINDOW w AS (PARTITION BY metric ORDER BY "time", event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         wo AS (PARTITION BY metric ORDER BY "time", event_id)
)
SELECT metric, "time", event_id, pct,
       CASE WHEN ABS(pct) > 10
            THEN printf('%s: Abweichung %.2f%% (>10%%)', metric, pct)
            WHEN frame_n = 3 AND gt2_n = 3
            THEN printf('%s: 3x in Folge Abweichung >2%% (%.2f%%, %.2f%%, %.2f%%)',
                        metric, pct_lag2, pct_lag1, pct)
       END AS alarm
FROM framed
WHERE (ABS(pct) > 10) OR (frame_n = 3 AND gt2_n = 3)
""",
    "edge_alarms": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
lagged AS (
  SELECT metric, operator, "time", event_id, value_num,
         LAG(value_num) OVER (PARTITION BY metric, operator
                              ORDER BY "time", event_id) AS prev_value
  FROM telemetry WHERE value_num IS NOT NULL
)
SELECT metric, operator, "time", event_id, value_num, prev_value,
       printf('Info: Low Level (%.2f) - Please Refill!', value_num) AS alarm
FROM lagged
WHERE value_num < 100.0 AND prev_value IS NOT NULL AND prev_value >= 100.0
""",
    "latched_error": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
marked AS (
  SELECT operator, "time", event_id, metric,
         CASE WHEN metric = 'error' THEN value_str
              WHEN metric = 'signup' THEN '' END AS marker
  FROM telemetry
)
SELECT operator, "time", event_id, metric,
       COALESCE(
         LAST_VALUE(marker IGNORE NULLS) OVER (
           PARTITION BY operator ORDER BY "time", event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         '') AS current_error
FROM marked
WHERE operator IS NOT NULL
""",
    "threshold_alarms": f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT metric, "time", event_id, value_num
FROM telemetry
WHERE value_num IS NOT NULL AND ABS(value_num - {_TARGET}) > 25
""",
    "error_burst_windows": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
counts AS (
  SELECT operator,
         epoch_us("time") // {BURST_BUCKET_SEC * 1_000_000} AS bkt,
         COUNT(*) AS n_errors
  FROM telemetry
  WHERE operator IS NOT NULL AND metric = 'error'
  GROUP BY 1, 2
)
SELECT operator,
       CAST(to_timestamp(bkt * {BURST_BUCKET_SEC}) AS TIMESTAMP) AS bucket_start,
       n_errors,
       CAST(SUM(n_errors) OVER (PARTITION BY operator ORDER BY bkt
                           RANGE BETWEEN {BURST_SPAN_BUCKETS - 1} PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
         AS sliding_errors,
       SUM(n_errors) OVER (PARTITION BY operator ORDER BY bkt
                           RANGE BETWEEN {BURST_SPAN_BUCKETS - 1} PRECEDING
                                     AND CURRENT ROW)
         >= {BURST_MIN_ERRORS} AS is_burst
FROM counts
""",
}

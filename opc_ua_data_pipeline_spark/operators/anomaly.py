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

At 100 TB the frame state is O(window) per key inside one sort-merge
window pass; the streaming twin is an applyInPandasWithState ring
buffer exactly like streaming/alarms.py keeps for deviation rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table

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
    current row — the score compares now against before)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy("ts", "event_id")
        .rowsBetween(-n_prev, -1)
    )
    dec = F.col("value").cast("decimal(28,6)")
    dec2 = (F.col("value") * F.col("value")).cast("decimal(28,6)")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum(dec2).over(w).cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        events.select(
            "event_id",
            "ts",
            F.col(key_col).alias("key"),
            "value",
            n.alias("n_prev"),
            F.when(n >= min_samples, mean).alias("roll_mean"),
            F.when(n >= min_samples, z).alias("zscore"),
        )
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


# ---------------------------------------------------------------------------
# Driver-contract queries + oracles
# ---------------------------------------------------------------------------


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_zscore(load_table(spark, sf_dir, "events"))


def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zscore_anomalies(load_table(spark, sf_dir, "events"))


QUERIES = {
    "rolling_zscore": q_rolling_zscore,
    "zscore_anomalies": q_zscore_anomalies,
    "winsorized_values": lambda spark, sf: winsorized_values(
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
}

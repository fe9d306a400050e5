"""Skyline (Pareto-front) operator: maximal points under dominance.

The classic multi-criteria DB operator (Börzsönyi et al., ICDE 2001
"The Skyline Operator"): keep the rows no other row dominates, where
q dominates p iff q is >= p on every dimension and > on at least one.
Here the two dimensions are (recency, value) per event_type — "the
readings never superseded by a later, equally-high reading", the
record-book query a monitoring dashboard runs over its whole history
(the 2-D special case is also the classic "max-vector" problem).

Spark-first shape (NOT the textbook block-nested-loop): in 2-D the
skyline has a closed window form — p survives iff

    value > MAX(value  |  t' > t)        (no later point at/above it)
    AND value = MAX(value | t' = t)      (no same-time point above it)

i.e. one suffix-max per key.  Equal (t, value) duplicates survive
together (neither strictly dominates).  The suffix max runs
DE-SKEWED with the module family's (key, day) two-pass: a RANGE
window over strictly-later micros inside each (key, day) partition,
plus a tiny per-(key, day) boundary table whose later-days suffix max
is broadcast back — bit-identical to the single-window global form
(max is associative; splitting {t' > t} into {same day, later t} ∪
{later days} is exact), while no task ever sorts more than one key's
single day.  The oracle states the SINGLE-window global form, so
parity re-proves the de-skew algebra on every run.

At 100 TB: two shuffles total (the (key, day) window sort and the
#key×#day-row boundary aggregate), broadcast join back, no
quadratic pair probe anywhere.  Reference parity: extension surface —
the reference's dashboards keep only latest/top-k (machine_dashboard
rawSql panels); the skyline is what "personal bests" needs instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table


def pareto_front(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key 2-D skyline over (time, value), both maximized."""
    x = events.filter(F.col("value").isNotNull()).select(
        F.col(key_col).alias("key"),
        "ts",
        "event_id",
        "value",
        F.to_date("ts").alias("_day"),
        F.unix_micros("ts").alias("_t"),
    )
    # pass 1a: suffix max over strictly-later micros WITHIN (key, day),
    # spelled as a DESCENDING running range frame (round 11): under
    # ORDER BY _t DESC, "UNBOUNDED PRECEDING .. 1 PRECEDING" is exactly
    # {_t' >= _t + 1}, the same strictly-later set — but Spark grows an
    # unbounded-PRECEDING frame incrementally (O(rows) per partition)
    # where the ascending unbounded-FOLLOWING spelling re-scans the
    # partition tail per row (O(rows²); the de-skewed day partitions
    # kept that bounded, the reversed frame removes it outright).
    # The same-instant max uses a RANGE(0,0) peers frame over the SAME
    # partition + order (equal _t implies equal day; a peers frame is
    # direction-insensitive), so Catalyst still fuses both into ONE
    # Window pass — one exchange + sort of the fact side, not two
    # (locked in tests/test_plans.py).
    w_later = (
        Window.partitionBy("key", "_day")
        .orderBy(F.col("_t").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = (
        Window.partitionBy("key", "_day")
        .orderBy(F.col("_t").desc())
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    local = x.withColumn("m_local", F.max("value").over(w_later)).withColumn(
        "m_same", F.max("value").over(w_same)
    )
    # pass 1b: per-(key, day) max, suffix-maxed over LATER days only —
    # same reversed running-frame spelling (one row per (key, day), so
    # the ROWS frame under _day DESC is exactly the later-days set)
    w_days = (
        Window.partitionBy("key")
        .orderBy(F.col("_day").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = (
        x.groupBy("key", "_day")
        .agg(F.max("value").alias("day_max"))
        .withColumn("m_days", F.max("day_max").over(w_days))
        .select("key", "_day", "m_days")
    )
    g = local.join(F.broadcast(bounds), ["key", "_day"])
    # greatest() skips NULLs (null iff both sides null = nothing later)
    m_later = F.greatest(F.col("m_local"), F.col("m_days"))
    return g.filter(
        (m_later.isNull() | (F.col("value") > m_later))
        & (F.col("value") == F.col("m_same"))
    ).select("key", "ts", "event_id", "value")


def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pareto_front(load_table(spark, sf_dir, "events"))


QUERIES = {"pareto_front": q_pareto_front}

# Single-window GLOBAL statement of the same algebra (no day split):
# parity against it re-proves the de-skew decomposition every run.
ORACLES = {
    "pareto_front": """
WITH x AS (
  SELECT event_type AS key, ts, event_id, value, epoch_us(ts) AS t
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT *,
         MAX(value) OVER (PARTITION BY key ORDER BY t
                          RANGE BETWEEN 1 FOLLOWING
                                    AND UNBOUNDED FOLLOWING) AS m_later,
         MAX(value) OVER (PARTITION BY key, t) AS m_same
  FROM x
)
SELECT key, ts, event_id, value
FROM s
WHERE (m_later IS NULL OR value > m_later) AND value = m_same
""",
}


def record_highs(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Rows that set a NEW RUNNING MAXIMUM for their key — the
    append-only companion of :func:`pareto_front`.  The skyline is a
    retrospective frontier (later points EVICT earlier ones, so no
    append-mode streaming operator can maintain it), while "new
    record" events are monotone — once emitted, never retracted —
    which is exactly the contract a live record-alert needs, and the
    reason the streaming twin (streaming/anomaly.record_high_stream)
    carries one double of state per key.

    A row is a record iff ``value > MAX(value)`` over all PRIOR rows
    of its key in (time, event_id) order; an equal re-reading does
    NOT re-alert.  Same (key, day) two-pass de-skew as pareto_front:
    within-day exclusive prefix max + a broadcast previous-days
    prefix-max boundary table, bit-identical to the single-window
    cummax (max splits exactly across the day partition).
    """
    x = events.filter(F.col("value").isNotNull()).select(
        F.col(key_col).alias("key"),
        "ts",
        "event_id",
        "value",
        F.to_date("ts").alias("_day"),
    )
    w_local = (
        Window.partitionBy("key", "_day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = x.withColumn("m_local", F.max("value").over(w_local))
    w_days = (
        Window.partitionBy("key")
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = (
        x.groupBy("key", "_day")
        .agg(F.max("value").alias("day_max"))
        .withColumn("m_prev_days", F.max("day_max").over(w_days))
        .select("key", "_day", "m_prev_days")
    )
    g = local.join(F.broadcast(bounds), ["key", "_day"])
    prev_max = F.greatest(F.col("m_local"), F.col("m_prev_days"))
    return g.filter(
        prev_max.isNull() | (F.col("value") > prev_max)
    ).select("key", "ts", "event_id", "value", prev_max.alias("prev_max"))

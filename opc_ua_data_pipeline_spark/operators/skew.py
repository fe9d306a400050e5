"""Skew mitigation — salted two-phase aggregation.

`events.event_type` has exactly 5 values over ~10^5..10^11 rows: a
direct groupBy degenerates to 5 reduce tasks no matter how many
executors exist.  Salting splits each hot key into n_salts synthetic
sub-keys: phase 1 aggregates (key, salt) — parallelism = 5 x n_salts —
phase 2 combines the per-salt partials (tiny input).  Works for any
associative aggregate; the decimal sums keep the combine exact, so
the result is bit-identical to the direct aggregation (which is the
oracle).

The salt is deterministic (hash of a unique column, not rand()) so
retries/replays stay idempotent.  For skewed JOINS Spark's AQE
(spark.sql.adaptive.skewJoin, enabled in session.py) splits oversized
partitions at runtime; this module covers the aggregation side AQE
does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

_DEC = "decimal(28,6)"


def salted_stats(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_source: str,
    n_salts: int = 16,
) -> DataFrame:
    """sum/count/min/max per key via salted two-phase aggregation."""
    salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    partials = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(F.col(value_col).cast(_DEC)).alias("_sum"),
            F.count(value_col).alias("_cnt"),
            F.min(value_col).alias("_min"),
            F.max(value_col).alias("_max"),
        )
    )
    return (
        partials.groupBy(*key_cols)
        .agg(
            F.sum("_sum").cast("double").alias("total_value"),
            F.sum("_cnt").alias("n_values"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
        )
    )


SKEW_TOP_N = 10


def key_skew_profile(
    df: DataFrame, key: str, top_n: int = SKEW_TOP_N
) -> DataFrame:
    """Join/aggregation-key skew diagnostics: the report an operator
    team reads BEFORE choosing salting / AQE-skew-join / broadcast for
    a 100 TB join.  Per heavy-hitter key: row count, share of table,
    and skew factor (count / mean-count-per-key).  One partial-
    aggregated groupBy; the key-count table (bounded by key
    cardinality) feeds a TakeOrderedAndProject top-N and a 1-row
    global summary that broadcasts back — nothing funnels the fact
    table through one task.

    share and skew_factor are exact int/int double divisions —
    engine-identical.
    """
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key_value")).limit(
        top_n
    )
    return top.crossJoin(F.broadcast(totals)).select(
        "key_value",
        "n_rows",
        (F.col("n_rows").cast("double") / F.col("total_rows")).alias(
            "share"
        ),
        (
            F.col("n_rows").cast("double")
            / (F.col("total_rows").cast("double") / F.col("n_keys"))
        ).alias("skew_factor"),
    )


#: Exact top-k selection per hot key.
TOPK_K = 5
TOPK_SALTS = 16


def topk_per_key(
    events: DataFrame, k: int = TOPK_K, n_salts: int = TOPK_SALTS
) -> DataFrame:
    """Exact top-``k`` users by total spend per event_type — the
    salted TWO-PHASE selection that replaces the classic (and
    skew-fatal) ``row_number() OVER (PARTITION BY hot_key)``:

    1. aggregate (event_type, user_id) totals — high-cardinality
       composite, map-side combinable, no skew;
    2. phase 1: per-(key, salt) top-k, where salt = hash(user_id) %
       n_salts — each window partition holds ~#users/n_salts rows and
       every user lives in exactly ONE salt, so the global top-k is a
       subset of the per-salt winners;
    3. phase 2: re-rank the k x n_salts survivors per key — a
       bounded-size window (80 rows/key at the defaults) no matter
       how many users exist.

    Totals sum as DECIMAL (exact, associative); ties break on
    user_id; anonymous traffic (NULL user_id) is excluded so both
    engines order identically.  The oracle is the naive single-window
    QUALIFY — salting must be invisible.
    """
    from pyspark.sql import Window

    per_user = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.sum(F.col("value").cast(_DEC)).alias("_sum"))
    )
    salt = F.pmod(F.xxhash64("user_id"), F.lit(n_salts))
    w1 = Window.partitionBy("event_type", "_salt").orderBy(
        F.col("_sum").desc(), F.col("user_id")
    )
    cand = (
        per_user.withColumn("_salt", salt)
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_r", "_salt")
    )
    w2 = Window.partitionBy("event_type").orderBy(
        F.col("_sum").desc(), F.col("user_id")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select(
            "event_type",
            "user_id",
            F.col("_sum").cast("double").alias("total_value"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def q_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return salted_stats(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        "value",
        salt_source="event_id",
    )


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew_profile(
        load_table(spark, sf_dir, "events"), "event_type"
    )


QUERIES = {
    "salted_event_stats": q_salted_event_stats,
    "key_skew_profile": q_key_skew,
    "topk_per_key": lambda spark, sf: topk_per_key(
        load_table(spark, sf, "events")
    ),
}

ORACLES = {
    # the oracle is the UNSALTED aggregation: salting must be invisible
    "salted_event_stats": """
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
       COUNT(value) AS n_values,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
""",
    "key_skew_profile": f"""
WITH counts AS (
  SELECT event_type AS key_value, COUNT(*) AS n_rows
  FROM events GROUP BY event_type
),
totals AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         COUNT(*) AS n_keys
  FROM counts
)
SELECT key_value, n_rows,
       CAST(n_rows AS DOUBLE) / total_rows AS share,
       CAST(n_rows AS DOUBLE)
         / (CAST(total_rows AS DOUBLE) / n_keys) AS skew_factor
FROM (SELECT * FROM counts
      ORDER BY n_rows DESC, key_value LIMIT {SKEW_TOP_N})
CROSS JOIN totals
""",
    # the oracle is the UNSALTED single-window top-k: the two-phase
    # selection must be invisible
    "topk_per_key": f"""
WITH per_user AS (
  SELECT event_type, user_id,
         SUM(CAST(value AS DECIMAL(28,6))) AS s
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, user_id, s,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY s DESC, user_id) AS rk
  FROM per_user
)
SELECT event_type, user_id,
       CAST(s AS DOUBLE) AS total_value,
       CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {TOPK_K}
""",
}

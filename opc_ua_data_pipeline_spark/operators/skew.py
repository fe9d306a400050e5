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


def q_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return salted_stats(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        "value",
        salt_source="event_id",
    )


QUERIES = {"salted_event_stats": q_salted_event_stats}

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
}

"""Data-quality expectations over the lake: the validation report a
pipeline publishes per ingest batch (null keys, domain ranges,
referential integrity, primary-key duplicates) — the Deequ/
Great-Expectations surface re-expressed as plain aggregates.

One row per check: (table_name, check_name, n_violations, n_rows,
violation_rate).  All counts are integers; the rate is one double
divide — trivially engine-exact.

Scale shape: the per-table predicate checks share ONE scan each (a
single aggregate computes every conditional count, then unpivots via
``stack`` — no per-check scans); the two referential checks are
anti-joins on the join key (one shuffle each, AQE-planned); the
duplicate-key check is a groupBy on the primary key.  The final
result is a union of 1-row frames — driver-sized regardless of input.

Reference parity: the reference pipeline trusts its own writer and
has no validation stage; this belongs to the large-scale-platform
extension surface (a 100 TB ingest without expectations is an
outage generator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

QTY_MIN, QTY_MAX = 1, 50


def _unpivot(one_row: DataFrame, table: str, checks: list[str]) -> DataFrame:
    stack = (
        f"stack({len(checks)}, "
        + ", ".join(f"'{c}', {c}" for c in checks)
        + ") AS (check_name, n_violations)"
    )
    return one_row.selectExpr(
        f"'{table}' AS table_name", stack, "n_rows"
    )


def dq_report(
    lineitem: DataFrame, orders: DataFrame, events: DataFrame
) -> DataFrame:
    """The expectations suite over lineitem / orders / events."""
    li = _unpivot(
        lineitem.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_orderkey").isNull().cast("long")).alias(
                "null_orderkey"
            ),
            F.sum(
                (
                    (F.col("l_quantity") < QTY_MIN)
                    | (F.col("l_quantity") > QTY_MAX)
                ).cast("long")
            ).alias("quantity_out_of_range"),
            F.sum((F.col("l_extendedprice") < 0).cast("long")).alias(
                "negative_price"
            ),
            F.sum(
                (F.col("l_shipdate").isNull()).cast("long")
            ).alias("null_shipdate"),
        ),
        "lineitem",
        [
            "null_orderkey",
            "quantity_out_of_range",
            "negative_price",
            "null_shipdate",
        ],
    )
    ev = _unpivot(
        events.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
            F.sum(F.col("user_id").isNull().cast("long")).alias(
                "null_user_id"
            ),
            F.sum(F.isnan("value").cast("long")).alias("nan_value"),
        ),
        "events",
        ["null_value", "null_user_id", "nan_value"],
    )
    li_total = lineitem.agg(F.count(F.lit(1)).alias("n_rows"))
    orders_total = orders.agg(F.count(F.lit(1)).alias("n_rows"))
    orphans = (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(li_total))
        .selectExpr(
            "'lineitem' AS table_name",
            "'orphan_orderkey' AS check_name",
            "n_violations",
            "n_rows",
        )
    )
    dup_pk = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_violations"))
        .crossJoin(F.broadcast(li_total))
        .selectExpr(
            "'lineitem' AS table_name",
            "'duplicate_pk' AS check_name",
            "n_violations",
            "n_rows",
        )
    )
    childless = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(orders_total))
        .selectExpr(
            "'orders' AS table_name",
            "'childless_order' AS check_name",
            "n_violations",
            "n_rows",
        )
    )
    out = li.unionByName(ev).unionByName(orphans).unionByName(dup_pk).unionByName(
        childless
    )
    return out.select(
        "table_name",
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (
            F.col("n_violations").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("violation_rate"),
    )


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_report(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "events"),
    )


QUERIES = {"dq_report": q_dq_report}

ORACLES = {
    "dq_report": f"""
WITH li AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
           AS null_orderkey,
         SUM(CASE WHEN l_quantity < {QTY_MIN} OR l_quantity > {QTY_MAX}
                  THEN 1 ELSE 0 END) AS quantity_out_of_range,
         SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
           AS negative_price,
         SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
           AS null_shipdate
  FROM lineitem
),
ev AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS null_value,
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user_id,
         SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS nan_value
  FROM events
),
raw AS (
  SELECT 'lineitem' AS table_name, 'null_orderkey' AS check_name,
         null_orderkey AS n_violations, n_rows FROM li
  UNION ALL
  SELECT 'lineitem', 'quantity_out_of_range', quantity_out_of_range, n_rows
  FROM li
  UNION ALL
  SELECT 'lineitem', 'negative_price', negative_price, n_rows FROM li
  UNION ALL
  SELECT 'lineitem', 'null_shipdate', null_shipdate, n_rows FROM li
  UNION ALL
  SELECT 'events', 'null_value', null_value, n_rows FROM ev
  UNION ALL
  SELECT 'events', 'null_user_id', null_user_id, n_rows FROM ev
  UNION ALL
  SELECT 'events', 'nan_value', nan_value, n_rows FROM ev
  UNION ALL
  SELECT 'lineitem', 'orphan_orderkey',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'lineitem', 'duplicate_pk',
         (SELECT COALESCE(SUM(c), 0) FROM (
            SELECT COUNT(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber) WHERE c > 1),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'orders', 'childless_order',
         (SELECT COUNT(*) FROM orders
          WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)),
         (SELECT COUNT(*) FROM orders)
)
SELECT table_name, check_name,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE)
         AS violation_rate
FROM raw
""",
}

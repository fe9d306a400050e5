"""The 16 dashboard panel queries, verbatim (machine_dashboard.json).

Each of the reference dashboard's rawSql statements, re-expressed over
the opcua_data-shaped bronze table and the machine_stats rollups, with
the original metric constants.  `PANELS` maps panel name ->
(builder, duckdb_sql) so tests replay every panel against the oracle
on the simulator fixture — the "a user could run every query they run
today" bar, checked query by query.

Grafana-isms handled as in SURVEY.md §2: ``$__timeFilter(col)``
becomes a parameterized BETWEEN; the ``NOW() AS time`` projection on
stat panels is dropped (non-deterministic vs the oracle, and purely
cosmetic); DISTINCT ON tie-breaking is pinned with a deterministic
secondary key (the reference leaves it to heap order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The ten latest-value stat panels (machine_dashboard.json:109,177,
#: 245,358,419,480,541,616,768,815).
STAT_PANEL_METRICS = [
    "ActualPlacementRateCPH",
    "ActualCycleTimeS",
    "VisionPassRatePct",
    "VacuumPressureKPa",
    "Feeder01Count",
    "Feeder02Count",
    "Feeder03Count",
    "Feeder04Count",
    "ProductionOrderProgressPct",
    "ActualAccuracyXum",
]

#: The production-info DISTINCT ON panel (json:283).
INFO_METRICS = [
    "Article",
    "ProductionOrder",
    "TotalPCBsOrder",
    "PCBsCompletedGood",
    "CurrentOperation",
]

#: Time-series panels over raw bronze (json:659,702).
SERIES_METRICS = ["ActualPlacementRateCPH", "ActualCycleTimeS"]

#: Rollup-scan panels (json:1120,1259,1398,1474,1626).
ROLLUP_PANEL_METRICS = [
    "ActualPlacementRateCPH",
    "ActualCycleTimeS",
    "VisionPassRatePct",
    "VacuumPressureKPa",
    "ActualAccuracyXum",
]

def _tie() -> Column:
    """Deterministic DISTINCT-ON tiebreak (needs an active session)."""
    return F.coalesce(F.col("value_str"), F.col("value_num").cast("string"))


def latest_value_panel(bronze: DataFrame, metric: str) -> DataFrame:
    """``SELECT NOW() AS time, value_num FROM opcua_data WHERE metric=?
    ORDER BY time DESC LIMIT 1`` (NOW() projection dropped)."""
    return (
        bronze.filter(F.col("metric") == metric)
        .orderBy(F.col("time").desc(), _tie().desc())
        .limit(1)
        .select("value_num")
    )


def production_info_panel(bronze: DataFrame) -> DataFrame:
    """``SELECT DISTINCT ON (metric) metric, COALESCE(value_str,
    CAST(value_num AS TEXT)) AS value FROM opcua_data WHERE metric IN
    (...) ORDER BY metric, time DESC`` (json:283)."""
    top = F.max_by(
        F.struct(F.col("value_str"), F.col("value_num")),
        F.struct(F.col("time"), _tie()),
    )
    return (
        bronze.filter(F.col("metric").isin(INFO_METRICS))
        .groupBy("metric")
        .agg(top.alias("_top"))
        .select(
            "metric",
            F.coalesce(
                F.col("_top.value_str"),
                F.col("_top.value_num").cast("decimal(18,2)").cast("string"),
            ).alias("value"),
        )
    )


def series_panel(bronze: DataFrame, metric: str, start: str, end: str) -> DataFrame:
    """``SELECT time, value_num FROM opcua_data WHERE metric=? AND
    $__timeFilter(time) ORDER BY time`` (json:659,702)."""
    return (
        bronze.filter(
            (F.col("metric") == metric)
            & F.col("time").between(F.lit(start), F.lit(end))
            & F.col("value_num").isNotNull()
        )
        .select("time", "value_num")
    )


def alarm_panel(bronze: DataFrame) -> DataFrame:
    """The recent-alarms panel (json:948) — see
    dashboard.reference_alarm_feed; re-exported here for the full set."""
    from .dashboard import reference_alarm_feed

    return reference_alarm_feed(bronze)


def rollup_panel(
    stats_minute: DataFrame, metric: str, start: str, end: str
) -> DataFrame:
    """``SELECT bucket, avg_value, min_value, max_value FROM
    machine_stats_minute WHERE metric=? AND $__timeFilter(bucket)
    ORDER BY bucket`` (json:1120,...)."""
    return (
        stats_minute.filter(
            (F.col("metric") == metric)
            & F.col("bucket").between(F.lit(start), F.lit(end))
        )
        .select("bucket", "avg_value", "min_value", "max_value")
    )


_RANGE = ("2024-06-01 08:00:00", "2024-06-01 10:00:00")

_TIE_SQL = "COALESCE(value_str, CAST(value_num AS VARCHAR))"


def _panels() -> dict:
    panels = {}
    for metric in STAT_PANEL_METRICS:
        panels[f"stat_{metric}"] = (
            lambda b, s, m=metric: latest_value_panel(b, m),
            f"""
            SELECT value_num FROM opcua_data WHERE metric = '{metric}'
            ORDER BY "time" DESC, {_TIE_SQL} DESC LIMIT 1
            """,
        )
    panels["production_info"] = (
        lambda b, s: production_info_panel(b),
        f"""
        WITH ranked AS (
          SELECT metric,
                 COALESCE(value_str,
                          CAST(CAST(value_num AS DECIMAL(18,2)) AS VARCHAR)) AS value,
                 ROW_NUMBER() OVER (PARTITION BY metric
                                    ORDER BY "time" DESC, {_TIE_SQL} DESC) AS rn
          FROM opcua_data
          WHERE metric IN ({", ".join(f"'{m}'" for m in INFO_METRICS)})
        )
        SELECT metric, value FROM ranked WHERE rn = 1
        """,
    )
    for metric in SERIES_METRICS:
        panels[f"series_{metric}"] = (
            lambda b, s, m=metric: series_panel(b, m, *_RANGE),
            f"""
            SELECT "time", value_num FROM opcua_data
            WHERE metric = '{metric}'
              AND "time" BETWEEN TIMESTAMP '{_RANGE[0]}' AND TIMESTAMP '{_RANGE[1]}'
              AND value_num IS NOT NULL
            """,
        )
    panels["recent_alarms"] = (
        lambda b, s: alarm_panel(b),
        """
        WITH last_running AS (
          SELECT COALESCE(MAX("time"), TIMESTAMP '1970-01-01') AS clear_time
          FROM opcua_data WHERE metric = 'Status' AND value_str = 'Running'
        )
        SELECT o."time", translate(o.value_str, '[]''"', '') AS alarm_text, o.operator
        FROM opcua_data o, last_running lr
        WHERE o.metric = 'ActiveAlarms'
          AND o.value_str IS NOT NULL AND o.value_str <> '' AND o.value_str <> '[]'
          AND (o.value_str LIKE '%Error:%' OR o.value_str LIKE '%Info:%')
          AND o."time" > lr.clear_time
        ORDER BY o."time" DESC LIMIT 50
        """,
    )
    for metric in ROLLUP_PANEL_METRICS:
        panels[f"rollup_{metric}"] = (
            lambda b, s, m=metric: rollup_panel(s, m, *_RANGE),
            f"""
            SELECT bucket, avg_value, min_value, max_value
            FROM machine_stats_minute
            WHERE metric = '{metric}'
              AND bucket BETWEEN TIMESTAMP '{_RANGE[0]}' AND TIMESTAMP '{_RANGE[1]}'
            """,
        )
    return panels


#: panel name -> (builder(bronze, stats_minute) -> DataFrame, duckdb_sql)
PANELS = _panels()

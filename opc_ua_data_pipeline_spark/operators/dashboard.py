"""Dashboard query pack — the 16 Grafana rawSql shapes (SURVEY.md §2.3-2.7).

Each of the reference's embedded SQL statements
(grafana/dashboards/machine_dashboard.json:109,177,245,283,...,948)
reduces to one of four shapes, implemented here as parameterized
DataFrame builders:

* W2/O1  latest value of one metric  (ORDER BY time DESC LIMIT 1)
* W1/P9  latest-per-metric           (DISTINCT ON (metric) ... ORDER BY
                                      metric, time DESC)
* J2     alarm feed                  (scalar-subquery cross join +
                                      LIKE/translate scrubbing + top-50)
* P11    time-range scan             ($__timeFilter BETWEEN)

Scale notes:
* top-1/top-k per ORDER BY...LIMIT compiles to TakeOrderedAndProject
  (per-partition heap + driver merge of k rows) — no global sort.
* latest-per-metric uses max_by/row_number after a metric-pruned scan;
  the metric equality/IN filters push to parquet (PushedFilters).
* the 1-row scalar-subquery side becomes a BroadcastNestedLoopJoin —
  broadcast of one row, never a shuffle of the fact side.
* tie-breaking on (time, event_id) keeps LIMIT deterministic — the
  DISTINCT ON fidelity risk from SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .ingest import TELEMETRY_SQL, telemetry

def _num_as_text(col: F.Column | None = None) -> F.Column:
    """Portable numeric->text rendering (F3/F15): going through
    DECIMAL(18,2) pins the string form ('40.00', not '40.0'/'4e1')
    identically in Spark and DuckDB, avoiding Java-vs-C++ double-repr
    drift.  (Function, not module constant: Column construction needs
    an active session.)"""
    if col is None:
        col = F.col("value_num")
    return col.cast("decimal(18,2)").cast("string")


_NUM_AS_TEXT_SQL = "CAST(CAST(value_num AS DECIMAL(18,2)) AS VARCHAR)"


def latest_value(df: DataFrame, metric: str) -> DataFrame:
    """W2/O1 — latest reading of one metric
    (machine_dashboard.json:109,177,245,...: ``WHERE metric = ?
    ORDER BY time DESC LIMIT 1``)."""
    return (
        df.filter(F.col("metric") == metric)
        .orderBy(F.col("time").desc(), F.col("event_id").desc())
        .limit(1)
        .select("metric", "time", "value_num")
    )


def latest_per_metric(df: DataFrame, metrics: list[str]) -> DataFrame:
    """W1/P9 — DISTINCT ON (metric) over an IN-list
    (machine_dashboard.json:283): first row per metric by recency,
    value rendered as text via COALESCE(value_str, CAST(value_num)).

    Spelled as a ``max_by(struct(payload), struct(time, event_id))``
    aggregate — one map-side-combinable shuffle keeping O(1) state per
    metric — instead of a ``row_number`` window, which sorts each
    metric's FULL history inside one task to keep a single row (the
    hottest dashboard family must not do that at 100 TB).  Struct
    ordering keys compare field-wise, so the (time, event_id) DESC
    tiebreak is identical to the window spelling.
    """
    top = F.max_by(
        F.struct(F.col("time"), F.col("value_str"), F.col("value_num")),
        F.struct(F.col("time"), F.col("event_id")),
    )
    return (
        df.filter(F.col("metric").isin(metrics))
        .groupBy("metric")
        .agg(top.alias("_top"))
        .select(
            "metric",
            F.coalesce(
                F.col("_top.value_str"), _num_as_text(F.col("_top.value_num"))
            ).alias("value"),
            F.col("_top.time").alias("time"),
        )
    )


def alarm_feed(df: DataFrame, clear_metric: str = "signup") -> DataFrame:
    """J2/F5/F6/P12/O2 — the recent-alarms panel
    (machine_dashboard.json:948).

    A 1-row aggregate (first `clear_metric` event ~ the reference's
    ``last_running`` CTE) is cross-joined to filter alarm rows, the
    alarm text is scrubbed with ``translate(value_str,'[]\'"','')``
    (list-repr hazard, SURVEY.md §1.2), LIKE predicates select
    Info:/Error: entries, and the newest 50 survive.
    """
    clear = df.filter(F.col("metric") == clear_metric).agg(
        F.coalesce(F.min("time"), F.to_timestamp(F.lit("1970-01-01"))).alias(
            "clear_time"
        )
    )
    v = F.col("value_str")
    return (
        df.crossJoin(F.broadcast(clear))
        .filter(
            (F.col("metric") == "error")
            & v.isNotNull()
            & (v != "")
            & (v != "[]")
            & (v.like("%Error:%") | v.like("%Info:%"))
            & (F.col("time") > F.col("clear_time"))
        )
        .orderBy(F.col("time").desc(), F.col("event_id").desc())
        .limit(50)
        .select(
            "time",
            F.translate(v, "[]'\"", "").alias("alarm_text"),
            "operator",
        )
    )


def reference_alarm_feed(df: DataFrame, limit: int = 50) -> DataFrame:
    """The VERBATIM J2 panel semantics (machine_dashboard.json:948) on
    an opcua_data-shaped frame: alarms (ActiveAlarms rows, list-repr
    scrubbed with translate) newer than the last ``Status='Running'``
    event, newest ``limit`` first.  Differs from :func:`alarm_feed`
    (the events-mapped variant) only in the metric/filter constants.
    """
    last_running = (
        df.filter((F.col("metric") == "Status") & (F.col("value_str") == "Running"))
        .agg(
            F.coalesce(F.max("time"), F.to_timestamp(F.lit("1970-01-01"))).alias(
                "clear_time"
            )
        )
    )
    v = F.col("value_str")
    return (
        df.crossJoin(F.broadcast(last_running))
        .filter(
            (F.col("metric") == "ActiveAlarms")
            & v.isNotNull()
            & (v != "")
            & (v != "[]")
            & (v.like("%Error:%") | v.like("%Info:%"))
            & (F.col("time") > F.col("clear_time"))
        )
        .orderBy(F.col("time").desc())
        .limit(limit)
        .select("time", F.translate(v, "[]'\"", "").alias("alarm_text"), "operator")
    )


def time_range_scan(df: DataFrame, metric: str, start: str, end: str) -> DataFrame:
    """S4/P8/P11/O3 — Grafana time-series panel scan:
    ``WHERE metric=? AND $__timeFilter(time) ORDER BY time``."""
    return (
        df.filter(
            (F.col("metric") == metric)
            & F.col("time").between(F.lit(start), F.lit(end))
            & F.col("value_num").isNotNull()
        )
        .select("time", "value_num", "operator", "event_id")
    )


# ---------------------------------------------------------------------------
# Driver-contract queries
# ---------------------------------------------------------------------------

_STATUS_METRICS = ["signup", "purchase", "view"]
_RANGE = ("2024-01-10 00:00:00", "2024-01-12 00:00:00")


def q_latest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return latest_value(telemetry(spark, sf_dir), "purchase")


def q_latest_per_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    return latest_per_metric(telemetry(spark, sf_dir), _STATUS_METRICS)


def q_alarm_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return alarm_feed(telemetry(spark, sf_dir))


def q_time_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_range_scan(telemetry(spark, sf_dir), "click", *_RANGE)


def q_progress_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — the production-progress clamp ``min(100, done/total*100)``
    (opcua_server/main.py:344): running event count per operator over
    its total, clamped with least().

    The operator key is LOW-CARDINALITY on driver data (3 values), so
    a bare ``Window.partitionBy(operator)`` running count would funnel
    each operator's whole history through one task.  De-skewed by
    composite re-keying: the running count is computed locally inside
    (operator, day) windows — day follows the sort key, so day groups
    are contiguous in the (time, event_id) order — and each day adds a
    cumulative offset taken from a per-(operator, day) count table
    that is tiny (#operators x #days rows) and broadcast back.  The
    result is bit-identical integer arithmetic; the per-task sort is
    now bounded by one key's single day, which holds at any scale
    where days accumulate.
    """
    from .ingest import telemetry

    t = telemetry(spark, sf_dir).filter(F.col("operator").isNotNull())
    t = t.withColumn("_day", F.to_date("time"))
    w_local = (
        Window.partitionBy("operator", "_day")
        .orderBy("time", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = t.select(
        "operator",
        "_day",
        "time",
        "event_id",
        F.count("*").over(w_local).alias("_local_run"),
    )

    day_counts = t.groupBy("operator", "_day").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy("operator")
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = day_counts.select(
        "operator",
        "_day",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy("operator")).alias("_total"),
    )

    return (
        local.join(F.broadcast(offsets), ["operator", "_day"])
        .select(
            "operator",
            "time",
            "event_id",
            F.least(
                F.lit(100.0),
                (F.col("_off") + F.col("_local_run"))
                / F.col("_total")
                * 110.0,
            ).alias("progress_pct"),
        )
    )


def q_alarm_list_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — keep-last-N list truncation (opcua_server/main.py:326-327:
    active alarms capped to the 20 newest): per metric, the ordered
    alarm texts sliced to the trailing 20, joined with '|' so the
    result column is a hashable scalar.

    NOTE ``slice(a, -20, 20)`` returns an EMPTY array when
    ``size(a) < 20`` — the clamped positive start
    ``slice(a, greatest(1, size(a)-19), 20)`` keeps all elements for
    short groups, matching the reference's keep-last-20 ring buffer.
    """
    from .ingest import telemetry

    t = telemetry(spark, sf_dir)
    texts = F.transform(
        F.array_sort(
            F.collect_list(F.struct("time", "event_id", "value_str"))
        ),
        lambda x: x["value_str"],
    )
    return (
        t.filter(F.col("value_str").isNotNull())
        .groupBy("metric")
        .agg(texts.alias("_texts"))
        .select(
            "metric",
            F.array_join(
                F.slice(
                    F.col("_texts"),
                    F.greatest(F.lit(1), F.size("_texts") - F.lit(19)),
                    20,
                ),
                "|",
            ).alias("last_alarms"),
        )
    )


QUERIES = {
    "latest_value": q_latest_value,
    "latest_per_metric": q_latest_per_metric,
    "alarm_feed": q_alarm_feed,
    "time_range_scan": q_time_range_scan,
    "progress_clamp": q_progress_clamp,
    "alarm_list_trunc": q_alarm_list_trunc,
}

_METRIC_IN = ", ".join(f"'{m}'" for m in _STATUS_METRICS)

ORACLES = {
    "latest_value": f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT metric, "time", value_num
FROM telemetry WHERE metric = 'purchase'
ORDER BY "time" DESC, event_id DESC LIMIT 1
""",
    "latest_per_metric": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
ranked AS (
  SELECT metric,
         COALESCE(value_str, {_NUM_AS_TEXT_SQL}) AS value,
         "time",
         ROW_NUMBER() OVER (PARTITION BY metric
                            ORDER BY "time" DESC, event_id DESC) AS rn
  FROM telemetry WHERE metric IN ({_METRIC_IN})
)
SELECT metric, value, "time" FROM ranked WHERE rn = 1
""",
    "alarm_feed": f"""
WITH telemetry AS ({TELEMETRY_SQL}),
last_clear AS (
  SELECT COALESCE(MIN("time"), TIMESTAMP '1970-01-01') AS clear_time
  FROM telemetry WHERE metric = 'signup'
)
SELECT o."time",
       translate(o.value_str, '[]''"', '') AS alarm_text,
       o.operator
FROM telemetry o, last_clear lc
WHERE o.metric = 'error'
  AND o.value_str IS NOT NULL AND o.value_str <> '' AND o.value_str <> '[]'
  AND (o.value_str LIKE '%Error:%' OR o.value_str LIKE '%Info:%')
  AND o."time" > lc.clear_time
ORDER BY o."time" DESC, o.event_id DESC LIMIT 50
""",
    "time_range_scan": f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT "time", value_num, operator, event_id
FROM telemetry
WHERE metric = 'click'
  AND "time" BETWEEN TIMESTAMP '{_RANGE[0]}' AND TIMESTAMP '{_RANGE[1]}'
  AND value_num IS NOT NULL
""",
    "progress_clamp": f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT operator, "time", event_id,
       LEAST(100.0,
             CAST(COUNT(*) OVER (PARTITION BY operator ORDER BY "time", event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY operator) * 110.0) AS progress_pct
FROM telemetry
WHERE operator IS NOT NULL
""",
    "alarm_list_trunc": f"""
WITH telemetry AS ({TELEMETRY_SQL})
SELECT metric,
       array_to_string((array_agg(value_str ORDER BY "time", event_id))[-20:],
                       '|') AS last_alarms
FROM telemetry
WHERE value_str IS NOT NULL
GROUP BY metric
""",
}

"""Ingest / normalize / enrich / type-dispatch (SURVEY.md §2.1-§2.3).

The reference's write path (entry point A, SURVEY.md §3.1) is three
row-at-a-time Python agents: normalize OPC-UA changes to
``{node_id, value, timestamp}`` JSON (opcua_mqtt_agent/main.py:48-52),
enrich with a KV context (hydration_agent/main.py:73-83), then
runtime-type-dispatch into the long/narrow ``opcua_data`` table
(kafka_db_agent/main.py:73-99).  Here the whole path is one declarative
DataFrame pipeline: `from_json` -> nested projection -> broadcast
context join -> CASE-WHEN dispatch -> time-partitioned append.

Scale note: every step is a narrow (per-row) transformation — no
shuffle anywhere on the ingest path; the only exchange at 100 TB is
the final partitioned write, and the context join is a broadcast
(J1) because the dimension side is tiny by construction.

The driver's `events` table stands in for the telemetry stream
(FIXTURES.md §5): a deterministic mapping view reshapes it into the
``opcua_data`` schema so every reference-shaped query also runs on
driver data and can be oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CONTEXT_SCHEMA, ENRICHED_EVENT_SCHEMA
from ..session import apply_runtime_confs
from ..tables import load_table

# ---------------------------------------------------------------------------
# Telemetry mapping view: driver `events` -> opcua_data shape
# ---------------------------------------------------------------------------
# One definition, two dialects (Spark DataFrame + DuckDB SQL CTE) that must
# stay in lockstep — the oracle queries below build on TELEMETRY_SQL.
#
# Mapping (exercises the reference's semantics on driver data):
#   time      <- ts
#   metric    <- event_type
#   value_num <- value, for non-'error' rows            (type dispatch P5:
#   value_str <- 'Error: code ' || props->k, for errors  numeric vs string)
#   operator  <- 'op-' || user_id%3, NULL for user_id%7==0 (nullable operator)
#   event_id kept as the deterministic tiebreaker for ORDER BY ... LIMIT.

TELEMETRY_SQL = """
  SELECT ts AS "time",
         event_type AS metric,
         CASE WHEN event_type <> 'error' THEN value END AS value_num,
         CASE WHEN event_type = 'error'
              THEN 'Error: code ' || json_extract_string(props, '$.k') END AS value_str,
         CASE WHEN user_id % 7 <> 0
              THEN 'op-' || CAST(user_id % 3 AS VARCHAR) END AS operator,
         event_id
  FROM events
"""


def telemetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` reshaped to the bronze ``opcua_data`` schema (+event_id).

    Mirrors P2 (JSON parse), P5 (runtime type dispatch: numeric ->
    value_num, else string -> value_str; kafka_db_agent/main.py:82-89)
    and the nullable-operator semantics (hydration_agent/main.py:73).
    All expressions are built-in (JVM/codegen); zero Python UDFs.
    """
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    is_err = F.col("event_type") == "error"
    return ev.select(
        F.col("ts").alias("time"),
        F.col("event_type").alias("metric"),
        F.when(~is_err, F.col("value")).alias("value_num"),
        F.when(
            is_err,
            F.concat(F.lit("Error: code "), F.get_json_object("props", "$.k")),
        ).alias("value_str"),
        F.when(
            F.col("user_id") % 7 != 0,
            F.concat(F.lit("op-"), (F.col("user_id") % 3).cast("string")),
        ).alias("operator"),
        F.col("event_id"),
    )


def write_bronze(df: DataFrame, path: str) -> None:
    """Append telemetry as a date-partitioned parquet table.

    Equivalent of the hypertable chunking on ``time``
    (database/init.sql:11): partition pruning over `date=` directories
    replaces chunk exclusion; parquet row-group min/max stats replace
    the ``(metric, time DESC)`` b-tree for metric-filtered scans.
    """
    (
        df.withColumn("date", F.to_date("time"))
        .repartition("date")
        .write.mode("append")
        .partitionBy("date")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Enriched-JSON round trip (P1/P2/P3/P4) and context join (J1)
# ---------------------------------------------------------------------------


def parse_enriched_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse hydration-agent messages (hydration_agent/main.py:76-83).

    `from_json` with the declared nested schema — no inference — then
    nested-field projection exactly as kafka_db_agent/main.py:73-80.
    """
    parsed = raw.select(
        F.from_json(F.col(value_col), ENRICHED_EVENT_SCHEMA).alias("m")
    )
    return parsed.select(
        F.col("m.original_data.node_id").alias("metric"),
        F.col("m.original_data.value").alias("raw_value"),
        # Timestamp coalesce P6 (kafka_db_agent/main.py:78): missing source
        # timestamp falls back to processing time.
        F.coalesce(
            F.to_timestamp("m.original_data.timestamp"), F.current_timestamp()
        ).alias("time"),
        F.col("m.context.operator").alias("operator"),
        F.col("m.context.last_maintenance").alias("last_maintenance"),
        F.col("m.context.enriched_at").alias("enriched_at"),
    )


def type_dispatch(df: DataFrame, value_col: str = "raw_value") -> DataFrame:
    """Runtime numeric-vs-string dispatch (kafka_db_agent/main.py:82-89).

    The writer decides per *value*, not per schema: int/float ->
    value_num (all numerics collapse to float64), everything else —
    including booleans, explicitly — stringifies into value_str.
    Python `str(True)` is 'True', so booleans are normalized to the
    reference's representation, not SQL's 'true' (F15 hazard,
    SURVEY.md §2.9).
    """
    v = F.col(value_col)
    # A string is "numeric" iff it fully parses as a float and is not a
    # Python-bool repr. try_cast returns NULL on failure (no exceptions).
    num = v.try_cast("double")
    is_bool = v.isin("true", "false", "True", "False")
    return df.withColumns(
        {
            "value_num": F.when(~is_bool, num),
            "value_str": F.when(
                is_bool, F.initcap(v)  # 'true' -> 'True' (Python repr)
            ).otherwise(F.when(num.isNull(), v)),
        }
    ).drop(value_col)


def enrich_with_context(events: DataFrame, context: DataFrame) -> DataFrame:
    """J1 — stream-static KV enrichment as a broadcast join.

    The reference does two synchronous Redis GETs per message
    (hydration_agent/main.py:73-74); here the context dimension is a
    1-row DataFrame broadcast to every executor — re-resolved per
    micro-batch in streaming, which reproduces the
    current-value-at-enrichment-time semantics.
    """
    return events.crossJoin(F.broadcast(context.select(*[f.name for f in CONTEXT_SCHEMA])))


def to_wire_json(df: DataFrame) -> DataFrame:
    """P1/P4 — re-nest and serialize to the Kafka wire format
    (hydration_agent/main.py:76-86): one `value` string column."""
    return df.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("metric").alias("node_id"),
                    F.col("raw_value").alias("value"),
                    F.date_format(
                        "time", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
                    ).alias("timestamp"),
                ).alias("original_data"),
                F.struct(
                    "operator",
                    "last_maintenance",
                    F.unix_timestamp().cast("double").alias("enriched_at"),
                ).alias("context"),
            )
        ).alias("value")
    )


# ---------------------------------------------------------------------------
# Driver-contract queries
# ---------------------------------------------------------------------------


def q_bronze_telemetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ingest projection/type-dispatch (P2-P6) on driver data."""
    return telemetry(spark, sf_dir)


QUERIES = {
    "bronze_telemetry": q_bronze_telemetry,
}

ORACLES = {
    "bronze_telemetry": f"WITH telemetry AS ({TELEMETRY_SQL}) SELECT * FROM telemetry",
}

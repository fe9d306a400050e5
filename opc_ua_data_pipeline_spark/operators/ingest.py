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


def telemetry_transform(ev: DataFrame) -> DataFrame:
    """The events->opcua_data reshape as a pure transformation —
    identical on batch and streaming DataFrames (narrow ops only)."""
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


def telemetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` reshaped to the bronze ``opcua_data`` schema (+event_id).

    Mirrors P2 (JSON parse), P5 (runtime type dispatch: numeric ->
    value_num, else string -> value_str; kafka_db_agent/main.py:82-89)
    and the nullable-operator semantics (hydration_agent/main.py:73).
    All expressions are built-in (JVM/codegen); zero Python UDFs.
    """
    apply_runtime_confs(spark)
    return telemetry_transform(load_table(spark, sf_dir, "events"))


def write_bronze(df: DataFrame, path: str) -> None:
    """Append telemetry as a date-partitioned parquet table.

    Equivalent of the hypertable chunking on ``time``
    (database/init.sql:11): partition pruning over `date=` directories
    replaces chunk exclusion.  Rows are sorted by (metric, time)
    within each file so parquet row-group min/max stats skip
    non-matching metrics — the layout-level stand-in for the
    ``(metric, time DESC)`` b-tree (init.sql:14); K4.
    """
    (
        df.withColumn("date", F.to_date("time"))
        .repartition("date")
        .sortWithinPartitions("metric", "time")
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


def wire_to_bronze(wire: DataFrame) -> DataFrame:
    """Raw wire rows (node_id, value, timestamp — the opcua_mqtt_agent
    payload, main.py:48-52) -> bronze opcua_data shape: P3 projection,
    P6 timestamp coalesce, P5 type dispatch.  Works on batch and
    streaming frames (narrow ops only)."""
    projected = wire.select(
        F.col("node_id").alias("metric"),
        F.col("value").alias("raw_value"),
        F.coalesce(F.to_timestamp("timestamp"), F.current_timestamp()).alias("time"),
    )
    return type_dispatch(projected).select(
        "time", "metric", "value_num", "value_str"
    )


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


def q_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the Redis-lookup enrichment as a stream-static broadcast
    join: every event gains the (1-row) context dimension, then the
    P4 struct nesting is flattened back out (checked columns)."""
    apply_runtime_confs(spark)
    ctx = spark.createDataFrame(
        [("John Doe", "2025-10-01")], schema=CONTEXT_SCHEMA
    )
    ev = load_table(spark, sf_dir, "events")
    enriched = enrich_with_context(ev, ctx)
    # P4: nest, then project nested fields (proves the struct shape).
    nested = enriched.select(
        F.struct("event_id", "ts", "event_type", "value").alias("original_data"),
        F.struct("operator", "last_maintenance").alias("context"),
    )
    return nested.select(
        F.col("original_data.event_id").alias("event_id"),
        F.col("original_data.event_type").alias("metric"),
        F.col("original_data.value").alias("value_num"),
        F.col("context.operator").alias("operator"),
        F.col("context.last_maintenance").alias("last_maintenance"),
    )


def q_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P5 — serialize each event to the reference's wire JSON
    (hydration_agent/main.py:76-83), parse it back with the declared
    schema, and runtime-type-dispatch the variant value — including
    boolean payloads, which must stringify Python-style ('True', not
    'true'; kafka_db_agent/main.py:86-89, F15 hazard).
    """
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    # Variant payload: signups carry a boolean, everything else numeric.
    payload = F.when(
        F.col("event_type") == "signup",
        F.when(F.col("user_id") % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
    ).otherwise(F.col("value").cast("string"))
    wire = ev.select(
        F.col("event_id"),
        F.to_json(
            F.struct(
                F.struct(
                    F.col("event_type").alias("node_id"),
                    payload.alias("value"),
                    F.date_format(
                        "ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
                    ).alias("timestamp"),
                ).alias("original_data"),
                F.struct(
                    F.lit("John Doe").alias("operator"),
                    F.lit("2025-10-01").alias("last_maintenance"),
                    F.lit(0.0).alias("enriched_at"),
                ).alias("context"),
            )
        ).alias("value"),
    )
    parsed = wire.select(
        "event_id", F.from_json(F.col("value"), ENRICHED_EVENT_SCHEMA).alias("m")
    ).select(
        "event_id",
        F.col("m.original_data.node_id").alias("metric"),
        F.col("m.original_data.value").alias("raw_value"),
        F.to_timestamp("m.original_data.timestamp").alias("time"),
        F.col("m.context.operator").alias("operator"),
    )
    return type_dispatch(parsed)


QUERIES = {
    "bronze_telemetry": q_bronze_telemetry,
    "enrichment_join": q_enrichment_join,
    "wire_roundtrip": q_wire_roundtrip,
}

ORACLES = {
    "bronze_telemetry": f"WITH telemetry AS ({TELEMETRY_SQL}) SELECT * FROM telemetry",
    "enrichment_join": """
SELECT event_id,
       event_type AS metric,
       value AS value_num,
       ctx.operator,
       ctx.last_maintenance
FROM events
CROSS JOIN (SELECT 'John Doe' AS operator, '2025-10-01' AS last_maintenance) ctx
""",
    # The JSON hop is an identity round-trip; the oracle states the
    # end-to-end semantics directly (numeric -> value_num, bool ->
    # Python-repr string in value_str).
    "wire_roundtrip": """
SELECT event_id,
       event_type AS metric,
       ts AS "time",
       'John Doe' AS operator,
       CASE WHEN event_type <> 'signup' THEN value END AS value_num,
       CASE WHEN event_type = 'signup'
            THEN CASE WHEN user_id % 2 = 0 THEN 'True' ELSE 'False' END
       END AS value_str
FROM events
""",
}

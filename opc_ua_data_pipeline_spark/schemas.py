"""Declared schemas — the single source of truth (no inference).

The reference declares its schema in three places that must agree:
OPC-UA variant types (opcua_server/main.py:152-203), the implicit JSON
wire schema (DOCUMENTATION.md:159-195), and the SQL DDL
(database/init.sql:2-8).  Here every shape lives in one module.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Raw telemetry message emitted by the OPC-UA->MQTT agent
#: (opcua_mqtt_agent/main.py:48-52): {node_id, value, timestamp}.
#: ``value`` is a runtime variant (number | string | bool); on the wire
#: we carry it as string and type-dispatch downstream exactly as the
#: DB writer does (kafka_db_agent/main.py:82-89).
RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
    ]
)

#: Enriched message produced by the hydration agent
#: (hydration_agent/main.py:76-83): payload nested under
#: ``original_data`` plus a ``context`` struct.  ``enriched_at`` is a
#: unix-epoch float, deliberately a different representation from the
#: ISO-8601 source timestamp (hydration_agent/main.py:81).
ENRICHED_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("original_data", RAW_EVENT_SCHEMA, False),
        T.StructField(
            "context",
            T.StructType(
                [
                    T.StructField("operator", T.StringType(), True),
                    T.StructField("last_maintenance", T.StringType(), True),
                    T.StructField("enriched_at", T.DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Bronze long/narrow ("EAV") time-series table, mirroring
#: ``opcua_data`` (database/init.sql:2-8).  Exactly one of
#: value_num/value_str is non-null per row; all numerics collapse to
#: float64 (kafka_db_agent/main.py:86-89 + init.sql:5) — reproduced,
#: not "fixed", so oracle hashes match.
OPCUA_DATA_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value_num", T.DoubleType(), True),
        T.StructField("value_str", T.StringType(), True),
        T.StructField("operator", T.StringType(), True),
    ]
)

#: Rollup table schema — continuous aggregates machine_stats_minute /
#: machine_stats_hourly (database/init.sql:18-29,37-48).
MACHINE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.TimestampType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("avg_value", T.DoubleType(), True),
        T.StructField("min_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
        T.StructField("sample_count", T.LongType(), True),
    ]
)

#: Enrichment context dimension (hydration_agent/main.py:37-42):
#: Redis keys context:operator / context:last_maintenance, pivoted to
#: one row for the stream-static broadcast join (J1).
CONTEXT_SCHEMA = T.StructType(
    [
        T.StructField("operator", T.StringType(), True),
        T.StructField("last_maintenance", T.StringType(), True),
    ]
)

#: Driver-generated `events` table (TESTDATA.md) — the stand-in stream.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

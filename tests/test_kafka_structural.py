"""Structural contract for the Kafka source/sink (SURVEY.md §2.1
S2/S3, K1/K2) — the kafka jar is not on this container's classpath,
so ``.load()``/``.start()`` cannot run; these tests pin everything
short of the socket: the source options the reference consumer uses
(kafka_db_agent/main.py:50-57), the producer options
(hydration_agent/main.py:54-57,85-86), and the full value-bytes →
bronze-columns transform driven through a static DataFrame with
Kafka's exact wire schema.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opc_ua_data_pipeline_spark.streaming.ingest import (
    KAFKA_FORMAT,
    from_kafka_raw,
    kafka_reader_options,
    kafka_sink_options,
)

#: Kafka's fixed source schema (what `format("kafka").load()` yields).
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def test_reader_options_match_reference_consumer():
    opts = kafka_reader_options("broker:9092", "machine_events")
    assert KAFKA_FORMAT == "kafka"
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "machine_events"
    # auto_offset_reset='earliest' in kafka_db_agent/main.py:54
    assert opts["startingOffsets"] == "earliest"


def test_sink_options_carry_topic_and_checkpoint():
    opts = kafka_sink_options("broker:9092", "enriched", "/tmp/ckpt")
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["topic"] == "enriched"
    assert opts["checkpointLocation"] == "/tmp/ckpt"


def test_value_bytes_to_bronze_transform(spark):
    """Drive the exact post-read transform with Kafka's wire schema:
    binary value -> JSON parse with the declared schema -> nested
    projection -> type dispatch (kafka_db_agent/main.py:60-89)."""
    msg = {
        "original_data": {
            "node_id": "Actual_X",
            "value": "42.5",
            "timestamp": "2024-01-01T00:00:01.000+00:00",
        },
        "context": {
            "operator": "op-1",
            "last_maintenance": "2023-12-01",
            "enriched_at": 1704067201.5,
        },
    }
    bool_msg = {
        "original_data": {
            "node_id": "Machine_Running",
            "value": "true",
            "timestamp": "2024-01-01T00:00:02.000+00:00",
        },
        "context": {
            "operator": "op-1",
            "last_maintenance": None,
            "enriched_at": 1704067202.5,
        },
    }
    raw = spark.createDataFrame(
        [
            (None, json.dumps(m).encode(), "machine_events", 0, i, None, 0)
            for i, m in enumerate([msg, bool_msg])
        ],
        KAFKA_WIRE_SCHEMA,
    )
    out = from_kafka_raw(raw)
    assert set(out.columns) == {
        "metric",
        "time",
        "operator",
        "last_maintenance",
        "enriched_at",
        "value_num",
        "value_str",
    }
    rows = {r["metric"]: r for r in out.collect()}
    assert rows["Actual_X"]["value_num"] == 42.5
    assert rows["Actual_X"]["value_str"] is None
    assert rows["Actual_X"]["operator"] == "op-1"
    # booleans stringify to the Python repr, never value_num (F15)
    assert rows["Machine_Running"]["value_num"] is None
    assert rows["Machine_Running"]["value_str"] == "True"

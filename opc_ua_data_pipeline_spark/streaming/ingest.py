"""Streaming ingest — the reference's write path as one Spark job.

Reference chain (SURVEY.md §3.1): OPC-UA subscription -> MQTT publish
-> Redis enrichment -> Kafka -> row-at-a-time INSERT
(opcua_mqtt_agent/main.py:93-130, hydration_agent/main.py:64-86,
kafka_db_agent/main.py:68-103).  Five process boundaries collapse to
source -> executors -> sink; the narrow transforms are the *same
functions* the batch path uses (operators/ingest.py), so batch and
stream cannot drift.

Sources: Kafka in production (``kafka_stream``), file/rate sources for
tests and replay (``file_stream``).  The Kafka reader is gated behind
the kafka-sql package being on the classpath (not bundled here).

Round-5 environment note: the live Kafka integration remains
structural-only by necessity — neither the ``spark-sql-kafka`` jar nor
any Kafka client library exists in this container (re-checked this
round), and no broker is reachable.  Coverage stands as: option/plan
structure pinned by tests/test_kafka_structural.py, and the full
source->transform->exactly-once-sink behavior driven end-to-end
through the schema-identical ``file_stream`` twin (the transforms are
the same functions, so swapping the source format is config, not
code).  First action if a jar ever appears: point ``kafka_stream`` at
a real broker and re-run the wire_roundtrip contract on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.ingest import parse_enriched_json, telemetry_transform, type_dispatch
from ..schemas import EVENTS_SCHEMA


def file_stream(spark: SparkSession, path: str) -> DataFrame:
    """Replay `events`-shaped parquet files as a stream (test/backfill
    source; one file per micro-batch with maxFilesPerTrigger=1)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


KAFKA_FORMAT = "kafka"


def kafka_reader_options(brokers: str, topic: str) -> dict[str, str]:
    """The exact source options the reference consumer uses
    (kafka_db_agent/main.py:50-57): subscribe to one topic, start at
    the earliest offset (the reference's ``auto_offset_reset=
    'earliest'``).  Factored out so the structural contract is
    testable without the kafka jar on the classpath."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }


def from_kafka_raw(raw: DataFrame) -> DataFrame:
    """The transform applied to Kafka's wire records (binary
    key/value + topic/partition/offset metadata): JSON values parsed
    with the declared enriched schema, then type-dispatched exactly
    as the reference's DB writer does (kafka_db_agent/main.py:60-71).
    Separated from the reader so a memory/file source with the same
    wire schema can drive it in tests."""
    parsed = parse_enriched_json(raw.select(F.col("value").cast("string")))
    return type_dispatch(parsed)


def kafka_stream(
    spark: SparkSession, brokers: str, topic: str = "machine_events"
) -> DataFrame:
    """S3 — Kafka source (kafka_db_agent/main.py:50-57): earliest
    offsets, JSON values parsed with the declared enriched schema and
    then type-dispatched exactly as the DB writer does."""
    reader = spark.readStream.format(KAFKA_FORMAT)
    for k, v in kafka_reader_options(brokers, topic).items():
        reader = reader.option(k, v)
    return from_kafka_raw(reader.load())


def kafka_sink_options(brokers: str, topic: str, checkpoint: str) -> dict[str, str]:
    """Producer-side options (hydration_agent/main.py:54-57,85-86 —
    broker + topic), plus the checkpoint that upgrades the reference's
    fire-and-forget producer to at-least-once."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def start_kafka_sink(
    df: DataFrame, brokers: str, topic: str, checkpoint: str
) -> StreamingQuery:
    """K1/K2 — the MQTT/Kafka producer hop (hydration_agent/main.py:
    54-57,85-86) as a Kafka sink: the payload re-serializes to the wire
    JSON via to_wire_json.  Unlike the reference's fire-and-forget
    producer, the checkpoint makes delivery at-least-once with
    idempotent restart.  Requires the spark-sql-kafka package on the
    classpath (not bundled in this container)."""
    from ..operators.ingest import to_wire_json

    writer = to_wire_json(df).writeStream.format(KAFKA_FORMAT)
    for k, v in kafka_sink_options(brokers, topic, checkpoint).items():
        writer = writer.option(k, v)
    return writer.start()


def start_bronze_ingest(
    stream: DataFrame, table_path: str, checkpoint: str, trigger_seconds: int = 30
) -> StreamingQuery:
    """K3 — the append sink with exactly-once semantics.

    The reference commits per row with Kafka auto-commit decoupled from
    the DB transaction (at-least/at-most-once mix); here the checkpoint
    + idempotent parquet append give end-to-end exactly-once.  Output is
    date-partitioned (hypertable-chunking equivalent, init.sql:11).
    """
    telemetry = telemetry_transform(stream).withColumn("date", F.to_date("time"))
    return (
        telemetry.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("date")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .outputMode("append")
        .start()
    )

"""Streaming transition pairs (streaming/transitions.py): the keyed
last-event processor over a time-ordered multi-batch replay must
produce exactly the pairs the batch lag window produces."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.streaming.transitions import (
    transition_pairs_stream,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_transition_pairs_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = sorted(
        (r.user_id, r.prev_event, r.next_event)
        for r in events.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_event"),
            F.col("event_type").alias("next_event"),
        )
        .filter(F.col("prev_event").isNotNull())
        .collect()
    )
    assert len(want) > 0

    # replay split by TIME (each user's events stay ordered across
    # micro-batches, matching event-time arrival)
    rows = events.orderBy("ts", "event_id").collect()
    d = tmp_path / "in"
    d.mkdir()
    mid = len(rows) // 2
    for i, chunk in enumerate([rows[:mid], rows[mid:]]):
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        transition_pairs_stream(stream)
        .writeStream.format("memory")
        .queryName("transition_pairs")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.user_id, r.prev_event, r.next_event)
        for r in spark.sql("SELECT * FROM transition_pairs").collect()
    )
    assert got == want

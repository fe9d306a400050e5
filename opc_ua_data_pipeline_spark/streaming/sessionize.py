"""Streaming sessionization — session_window over the event stream.

The batch twin (operators/relational.sessionize) assigns sessions via
lag+cumsum; streaming uses Spark's native ``session_window`` (gap-based
dynamic windows merged in the state store).  Same 30-minute-gap
semantics: a session closes when the watermark passes last_event +
gap.

State at 100 TB: one open session per active user key — bounded by
concurrent actives, not history; closed sessions leave the store as
soon as they emit (append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes"), F.col("user_id")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "total_value"
        )
    )

"""Stream-stream interval join — online incident correlation.

The streaming twin of ``operators/relational.incident_range_join``:
error events open a [t, t+window) interval; activity of the same user
inside it joins online.  Structured Streaming buffers both sides in
watermark-bounded state and emits matches as they become provable —
the range condition on the two event-time columns is what lets the
engine compute how long each side must be retained (state is
O(events per watermark horizon), not O(stream)).

Contrast with the reference: its enrichment joins are stream-static
Redis lookups (hydration_agent/main.py:73-74); correlating two live
streams has no equivalent there at all — the DB would do it after the
fact.  Here it is the same declarative join, just on unbounded
inputs.  tests/test_streaming_correlate.py drives a multi-file replay
and checks the result equals the batch range join row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INCIDENT_WINDOW_MIN = 10
CORRELATE_WATERMARK = "30 minutes"


def incident_stream_join(
    events: DataFrame,
    window_minutes: int = INCIDENT_WINDOW_MIN,
    watermark: str = CORRELATE_WATERMARK,
) -> DataFrame:
    """events (streaming) → (incident_id, event_id, user_id,
    event_type, lag_us) matches, batch-equivalent to
    ``incident_range_join``."""
    incidents = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("user_id").alias("i_user"),
            F.col("ts").alias("i_ts"),
        )
        .withWatermark("i_ts", watermark)
    )
    activity = events.select(
        "event_id", "user_id", "event_type", "ts"
    ).withWatermark("ts", watermark)
    return (
        activity.join(
            incidents,
            (activity.user_id == incidents.i_user)
            & (activity.ts >= incidents.i_ts)
            & (
                activity.ts
                < incidents.i_ts + F.expr(f"INTERVAL {window_minutes} MINUTES")
            )
            & (activity.event_id != incidents.incident_id),
        )
        .select(
            "incident_id",
            "event_id",
            "user_id",
            "event_type",
            (F.unix_micros("ts") - F.unix_micros("i_ts")).alias("lag_us"),
        )
    )

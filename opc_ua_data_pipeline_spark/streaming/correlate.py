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


def _watermarked_sides(
    events: DataFrame, watermark: str
) -> tuple[DataFrame, DataFrame]:
    """Split one watermarked stream into (incidents, activity).

    The watermark is applied to the source BEFORE the error filter —
    this matters: Spark's global watermark is the MIN over every
    watermarked branch, and a watermark defined after
    ``filter(event_type == 'error')`` only advances when error events
    arrive.  A quiet error stream would then pin the global watermark
    at the last error's timestamp: join state grows without bound and
    (in the outer variant) NULL rows for the newest incidents are
    never provably emittable.  Watermarking first means both branches
    inherit event-time progress from the FULL stream (the annotation
    survives the filter and the ``ts``→``i_ts`` rename), so state is
    bounded by data rate, not by alarm rate.
    """
    wm = events.withWatermark("ts", watermark)
    incidents = wm.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id").alias("i_user"),
        F.col("ts").alias("i_ts"),
    )
    activity = wm.select("event_id", "user_id", "event_type", "ts")
    return incidents, activity


def incident_stream_join(
    events: DataFrame,
    window_minutes: int = INCIDENT_WINDOW_MIN,
    watermark: str = CORRELATE_WATERMARK,
) -> DataFrame:
    """events (streaming) → (incident_id, event_id, user_id,
    event_type, lag_us) matches, batch-equivalent to
    ``incident_range_join``."""
    incidents, activity = _watermarked_sides(events, watermark)
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


def incident_stream_left_join(
    events: DataFrame,
    window_minutes: int = INCIDENT_WINDOW_MIN,
    watermark: str = CORRELATE_WATERMARK,
) -> DataFrame:
    """LEFT OUTER variant: every incident appears — matched rows as in
    ``incident_stream_join``, and incidents with NO same-user activity
    in their interval emitted once with NULL activity columns.

    Outer rows are only provable when no qualifying activity can still
    arrive, so Structured Streaming holds each incident in state until
    the watermark passes ``i_ts + window`` and emits the NULL-extended
    row then (possibly in a no-data micro-batch after the stream goes
    quiet).  State stays watermark-bounded exactly as in the inner
    join; the outer semantics cost no extra retention, only delayed
    emission.  Batch equivalence (matched ∪ unmatched-with-NULLs) is
    driven in tests/test_streaming_topk_outer.py.
    """
    incidents, activity = _watermarked_sides(events, watermark)
    return (
        incidents.join(
            activity,
            (activity.user_id == incidents.i_user)
            & (activity.ts >= incidents.i_ts)
            & (
                activity.ts
                < incidents.i_ts + F.expr(f"INTERVAL {window_minutes} MINUTES")
            )
            & (activity.event_id != incidents.incident_id),
            "leftOuter",
        )
        .select(
            "incident_id",
            F.col("i_user").alias("user_id"),
            "event_id",
            "event_type",
            (F.unix_micros("ts") - F.unix_micros("i_ts")).alias("lag_us"),
        )
    )

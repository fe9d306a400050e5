"""Streaming alarm processors — keyed state over the telemetry stream.

In the reference these semantics live in mutable per-key state inside
the simulator process (opcua_server/main.py:14-40 DeviationTracker,
:319-332 feeder edge flags, :398-434 latched CurrentError).  Here each
becomes an ``applyInPandasWithState`` processor keyed by metric (or
any key): Arrow-batched, state-store-backed, horizontally partitioned
by key — the idiomatic Spark shape for "a little state per key over an
unbounded stream".

Contract (pinned by tests/test_streaming.py): fed the same rows in
event-time order, each processor emits exactly what its batch
window-function twin in operators/alarms.py emits.

State size: O(1) per key (two flags / one double / one string) — at
100 TB-scale key cardinality the state store shards across executors
and nothing accumulates with stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_TARGET = 77.0  # kept in lockstep with operators.alarms._TARGET

DEVIATION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("pct", T.DoubleType()),
        T.StructField("alarm", T.StringType()),
    ]
)
#: (valid & |pct|>2) flags of the previous two samples + samples seen.
DEVIATION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("p1", T.DoubleType()),
        T.StructField("p2", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _deviation_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """W3 streaming twin: trailing-3 deviation rules with rule-1
    precedence (opcua_server/main.py:35-39); the 3-deep ring buffer
    collapses to two carry-over flags."""
    (metric,) = key
    p1, p2, n_seen = state.get if state.exists else (None, None, 0)
    out_rows = []
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            v = row.value_num
            if v is None or pd.isna(v):
                continue
            pct = (v - _TARGET) / _TARGET * 100 if _TARGET != 0 else None
            if pct is None:
                # target==0 guard: the reference returns before touching
                # the buffer (opcua_server/main.py:29-30) — no slot used.
                continue
            n_seen += 1
            alarm = None
            if abs(pct) > 10:
                alarm = f"{metric}: Abweichung {pct:.2f}% (>10%)"
            elif (
                n_seen >= 3
                and abs(pct) > 2
                and p1 is not None
                and abs(p1) > 2
                and p2 is not None
                and abs(p2) > 2
            ):
                # All three trailing deviations, oldest first — the
                # reference joins the whole ring buffer
                # (opcua_server/main.py:38-39).
                alarm = (
                    f"{metric}: 3x in Folge Abweichung >2% "
                    f"({p2:.2f}%, {p1:.2f}%, {pct:.2f}%)"
                )
            if alarm is not None:
                out_rows.append((metric, row.time, row.event_id, pct, alarm))
            p2, p1 = p1, pct
    state.update((p1, p2, n_seen))
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["metric", "time", "event_id", "pct", "alarm"]
        )


EDGE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("operator", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value_num", T.DoubleType()),
        T.StructField("prev_value", T.DoubleType()),
        T.StructField("alarm", T.StringType()),
    ]
)
EDGE_STATE_SCHEMA = T.StructType([T.StructField("prev_value", T.DoubleType())])

EDGE_THRESHOLD = 100.0


def _edge_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """W4 streaming twin: falling-edge detection — fire only on the
    transition below the threshold, reset on recovery (the per-feeder
    state flag at opcua_server/main.py:319-332 generalized to a
    carried previous value)."""
    metric, operator = key
    (prev,) = state.get if state.exists else (None,)
    out_rows = []
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            v = row.value_num
            if v is None or pd.isna(v):
                continue
            if v < EDGE_THRESHOLD and prev is not None and prev >= EDGE_THRESHOLD:
                out_rows.append(
                    (
                        metric,
                        operator,
                        row.time,
                        row.event_id,
                        v,
                        prev,
                        f"Info: Low Level ({v:.2f}) - Please Refill!",
                    )
                )
            prev = v
    state.update((prev,))
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=[
                "metric",
                "operator",
                "time",
                "event_id",
                "value_num",
                "prev_value",
                "alarm",
            ],
        )


LATCH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("operator", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("metric", T.StringType()),
        T.StructField("current_error", T.StringType()),
    ]
)
LATCH_STATE_SCHEMA = T.StructType([T.StructField("current", T.StringType())])


def _latch_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """W5 streaming twin: CurrentError latched until an explicit clear
    (opcua_server/main.py:212-221,398-434); clear writes '' exactly as
    the reference does (:216)."""
    (operator,) = key
    (current,) = state.get if state.exists else ("",)
    out_rows = []
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            if row.metric == "error" and row.value_str is not None:
                current = row.value_str
            elif row.metric == "signup":
                current = ""
            out_rows.append(
                (operator, row.time, row.event_id, row.metric, current or "")
            )
    state.update((current,))
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=["operator", "time", "event_id", "metric", "current_error"],
        )


def deviation_alarm_stream(telemetry: DataFrame) -> DataFrame:
    return telemetry.groupBy("metric").applyInPandasWithState(
        _deviation_fn,
        DEVIATION_OUTPUT_SCHEMA,
        DEVIATION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def edge_alarm_stream(telemetry: DataFrame) -> DataFrame:
    return telemetry.groupBy("metric", "operator").applyInPandasWithState(
        _edge_fn,
        EDGE_OUTPUT_SCHEMA,
        EDGE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def latched_error_stream(telemetry: DataFrame) -> DataFrame:
    return telemetry.filter("operator IS NOT NULL").groupBy("operator").applyInPandasWithState(
        _latch_fn,
        LATCH_OUTPUT_SCHEMA,
        LATCH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

"""Streaming event-transition extraction: per-user Markov pairs with
O(1) keyed state.

The batch operator (operators/relational.event_transition_matrix)
builds (prev, next) pairs with a lag window; a stream can't window
over unbounded history, so the streaming twin holds exactly ONE value
per user — the last event type seen — in an
``applyInPandasWithState`` processor (the same shape as the alarm
trackers in streaming/alarms.py: state never grows with stream
length).  Each arriving micro-batch is sorted (ts, event_id) inside
the group — the same deterministic order the batch window uses — and
emits one pair per event after the user's first.

Downstream, the transition COUNTS are a plain streaming aggregation
over the emitted pairs (update mode, #types² state); kept separate
because chaining two stateful operators constrains output modes — the
pair stream is the reusable building block.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAIRS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("prev_event", T.StringType()),
        T.StructField("next_event", T.StringType()),
    ]
)

PAIRS_STATE_SCHEMA = T.StructType(
    [T.StructField("last_event", T.StringType())]
)


def _pairs_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (uid,) = key
    last = state.get[0] if state.exists else None
    rows = []
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        df = pd.concat(chunks).sort_values(["ts", "event_id"])
        for r in df.itertuples():
            if last is not None:
                rows.append((uid, last, r.event_type))
            last = r.event_type
    state.update((last,))
    yield pd.DataFrame(
        rows, columns=["user_id", "prev_event", "next_event"]
    )


def transition_pairs_stream(events: DataFrame) -> DataFrame:
    """events stream -> (user_id, prev_event, next_event) pairs;
    state = one string per user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _pairs_fn,
        PAIRS_OUTPUT_SCHEMA,
        PAIRS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

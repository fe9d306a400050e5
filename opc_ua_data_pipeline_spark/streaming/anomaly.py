"""Streaming rolling z-score — the online twin of operators/anomaly.py.

An ``applyInPandasWithState`` processor keyed by event_type holding a
``ROLL_WINDOW``-deep ring buffer: exactly the shape of the reference's
DeviationTracker (opcua_server/main.py:14-40, a 3-deep buffer per
metric), scaled from 3 samples to a real trailing distribution.

Exactness contract: the batch operator computes frame statistics from
DECIMAL(28,6) sums; here each arriving value is quantized once to an
integer micro-unit (``Decimal(repr(v))`` → the same shortest-repr
rounding Spark's double→decimal cast uses), and the ring keeps
*running integer sums* — O(1) per row, overflow-safe in int64, and
``s_int / 1e6`` reproduces the batch decimal→double value bit-for-bit.
So stream output ≡ batch output row-for-row, not approximately
(tests/test_streaming_anomaly.py).

State per key: 2×int64 running sums + ``ROLL_WINDOW`` int64 pairs —
O(window), independent of stream length.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.anomaly import MIN_SAMPLES, ROLL_WINDOW

_Q6 = Decimal("0.000001")


def _micro6(v: float) -> int:
    """v → integer micro-units, matching Spark's double→DECIMAL(28,6)
    (BigDecimal.valueOf: shortest repr, then HALF_UP at 6 dp)."""
    return int(
        (Decimal(repr(v)).quantize(_Q6, rounding=ROUND_HALF_UP) * 1_000_000)
    )


ZSCORE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_prev", T.LongType()),
        T.StructField("roll_mean", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)

ZSCORE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("v6", T.ArrayType(T.LongType())),
        T.StructField("sq6", T.ArrayType(T.LongType())),
    ]
)


def _zscore_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (k,) = key
    v6, sq6 = ([list(a) for a in state.get] if state.exists else ([], []))
    s1, s2 = sum(v6), sum(sq6)
    out = []
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        df = pd.concat(chunks).sort_values(["ts", "event_id"])
        for r in df.itertuples():
            n = len(v6)
            mean = z = None
            if n >= MIN_SAMPLES:
                s1f, s2f = s1 / 1e6, s2 / 1e6
                mean = s1f / n
                var = (s2f - s1f * s1f / n) / (n - 1)
                z = (r.value - mean) / math.sqrt(var)
            out.append(
                (r.event_id, r.ts, k, r.value, n, mean, z)
            )
            a, b = _micro6(r.value), _micro6(r.value * r.value)
            v6.append(a), sq6.append(b)
            s1, s2 = s1 + a, s2 + b
            if len(v6) > ROLL_WINDOW:
                s1, s2 = s1 - v6.pop(0), s2 - sq6.pop(0)
    state.update((v6, sq6))
    yield pd.DataFrame(
        out,
        columns=[
            "event_id", "ts", "key", "value", "n_prev", "roll_mean", "zscore",
        ],
    )


def zscore_stream(events: DataFrame) -> DataFrame:
    return events.groupBy("event_type").applyInPandasWithState(
        _zscore_fn,
        ZSCORE_OUTPUT_SCHEMA,
        ZSCORE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM — the online twin of operators/anomaly.cusum_scores
# ---------------------------------------------------------------------------

CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("x", T.LongType()),
        T.StructField("cusum_high", T.LongType()),
        T.StructField("cusum_low", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)

CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("p_hi", T.LongType()),
        T.StructField("m_hi", T.LongType()),
        T.StructField("p_lo", T.LongType()),
        T.StructField("m_lo", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_eid", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)


def cusum_stream(
    events: DataFrame, target_micro: int, slack_micro: int
) -> DataFrame:
    """Online two-sided CUSUM per event_type against a FIXED target
    (the deployed setting: the process mean is known from history or
    spec; the batch operator's data-derived target needs the full
    series by definition).  State is O(1) per key — two prefix sums
    and two running minima, the closed prefix-min form maintained
    incrementally — so the statistic survives unbounded streams.

    Disorder contract (module convention): rows behind the key's last
    applied (event-time, event_id) are dropped and counted in
    ``n_disordered`` — a late row cannot be retro-inserted into a
    prefix statistic with O(1) state.

    Fed in event-time order, output ≡ batch
    ``cusum_scores`` with the same target/slack, bit-for-bit
    (tests/test_streaming_cusum.py).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            p_hi, m_hi, p_lo, m_lo, last_us, last_eid, n_dis = state.get
        else:
            p_hi = p_lo = 0
            # running minima start "empty": the closed form uses
            # least(0, min) so +inf sentinels collapse to 0 correctly
            m_hi = m_lo = None
            last_us = last_eid = None
            n_dis = 0
        out = []
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            df = pd.concat(chunks).sort_values(["ts", "event_id"])
            for r in df.itertuples():
                if pd.isna(r.value):
                    continue
                t_us = int(r.ts.value // 1000)
                if last_us is not None and (t_us, r.event_id) < (
                    last_us,
                    last_eid,
                ):
                    n_dis += 1
                    continue
                x = _micro6(r.value)
                p_hi += x - target_micro - slack_micro
                p_lo += target_micro - slack_micro - x
                m_hi = p_hi if m_hi is None else min(m_hi, p_hi)
                m_lo = p_lo if m_lo is None else min(m_lo, p_lo)
                out.append(
                    (
                        r.event_id,
                        r.ts,
                        k,
                        x,
                        p_hi - min(0, m_hi),
                        p_lo - min(0, m_lo),
                        n_dis,
                    )
                )
                last_us, last_eid = t_us, r.event_id
        state.update((p_hi, m_hi, p_lo, m_lo, last_us, last_eid, n_dis))
        yield pd.DataFrame(
            out,
            columns=[
                "event_id", "ts", "key", "x",
                "cusum_high", "cusum_low", "n_disordered",
            ],
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        CUSUM_OUTPUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

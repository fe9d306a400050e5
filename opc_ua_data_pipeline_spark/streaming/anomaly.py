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


# ---------------------------------------------------------------------------
# Streaming Hampel — delayed-emission twin of operators/anomaly.hampel_despike
# ---------------------------------------------------------------------------

HAMPEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("roll_median", T.DoubleType()),
        T.StructField("roll_mad", T.DoubleType()),
        T.StructField("is_spike", T.BooleanType()),
        T.StructField("repaired", T.DoubleType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)

# buffer rows: parallel arrays (eid, t_us, x_micro, value)
HAMPEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("eids", T.ArrayType(T.LongType())),
        T.StructField("t_us", T.ArrayType(T.LongType())),
        T.StructField("x6", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("n_pending", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)


def _hampel_row(xs: list, i: int, half: int):
    """Evaluate the centered frame around index i of integer-micro
    series xs — the batch operator's exact doubled-unit arithmetic."""
    lo = max(0, i - half)
    arr = sorted(xs[lo : i + half + 1])
    n = len(arr)
    med2 = 2 * arr[(n + 1) // 2 - 1] if n % 2 == 1 else arr[n // 2 - 1] + arr[n // 2]
    devs = sorted(abs(2 * e - med2) for e in arr)
    m = len(devs)
    mad4 = (
        2 * devs[(m + 1) // 2 - 1] if m % 2 == 1 else devs[m // 2 - 1] + devs[m // 2]
    )
    is_spike = 20000 * abs(2 * xs[i] - med2) > 44478 * mad4
    med_val = med2 / 2.0 / 1e6
    mad_val = mad4 / 4.0 / 1e6
    return med_val, mad_val, is_spike


def hampel_stream(events: DataFrame, half: int = 3) -> DataFrame:
    """Online centered-frame despiking: a row needs ``half`` FUTURE
    rows before its frame closes, so emission is DELAYED by exactly
    ``half`` samples per key — the streaming price of a centered
    window (contrast the trailing-frame z-score, which emits
    immediately).  State keeps the pending tail plus ``half`` rows of
    emitted context: O(2·half+1) per key, independent of stream
    length.  The last ``half`` rows of a stream stay pending forever —
    batch ≡ stream on all CLOSED frames (tests/test_streaming_cusum.py
    companion file pins the exact correspondence).

    Disorder contract (module convention): late rows are dropped and
    counted, never retro-inserted.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            eids, t_us, x6, vals, n_pending, n_dis = [
                list(v) if isinstance(v, (list, tuple)) else v
                for v in state.get
            ]
        else:
            eids, t_us, x6, vals = [], [], [], []
            n_pending, n_dis = 0, 0
        out = []
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            df = pd.concat(chunks).sort_values(["ts", "event_id"])
            for r in df.itertuples():
                if pd.isna(r.value):
                    continue
                t = int(r.ts.value // 1000)
                if eids and (t, r.event_id) < (t_us[-1], eids[-1]):
                    n_dis += 1
                    continue
                eids.append(r.event_id)
                t_us.append(t)
                x6.append(_micro6(r.value))
                vals.append(float(r.value))
                n_pending += 1
                # emit every pending row that now has `half` successors
                while n_pending > half:
                    i = len(eids) - n_pending  # oldest pending index
                    med_val, mad_val, spike = _hampel_row(x6, i, half)
                    out.append(
                        (
                            eids[i],
                            pd.Timestamp(t_us[i] * 1000),
                            k,
                            vals[i],
                            med_val,
                            mad_val,
                            spike,
                            med_val if spike else vals[i],
                            n_dis,
                        )
                    )
                    n_pending -= 1
                    # trim: emitted context older than `half` before the
                    # oldest pending row is never needed again
                    keep_from = max(0, len(eids) - n_pending - half)
                    if keep_from:
                        eids = eids[keep_from:]
                        t_us = t_us[keep_from:]
                        x6 = x6[keep_from:]
                        vals = vals[keep_from:]
        state.update((eids, t_us, x6, vals, n_pending, n_dis))
        yield pd.DataFrame(
            out,
            columns=[
                "event_id", "ts", "key", "value", "roll_median",
                "roll_mad", "is_spike", "repaired", "n_disordered",
            ],
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        HAMPEL_OUTPUT_SCHEMA,
        HAMPEL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming seasonal scoring — the online twin of
# operators/anomaly.seasonal_anomalies
# ---------------------------------------------------------------------------


def seasonal_stream(
    events_stream: DataFrame,
    profile: DataFrame,
    **knobs,
) -> DataFrame:
    """Score a live event stream against a FROZEN (metric, hour-of-
    day) seasonal profile (operators/anomaly.seasonal_profile output,
    trained on history by a batch job).

    Unlike the keyed-state twins above, seasonal scoring needs NO
    state at all: the profile is a #metrics x 24-row static frame, so
    this is a narrow telemetry projection plus a stream-static
    BROADCAST join — every micro-batch scores independently, restart
    is trivially exactly-once, and the operator scales with the
    stream, not the history.  Batch ≡ stream bit-for-bit when the
    profile is trained on the same history
    (tests/test_streaming_anomaly.py).
    """
    from ..operators.anomaly import seasonal_anomalies
    from ..operators.ingest import telemetry_transform

    return seasonal_anomalies(
        telemetry_transform(events_stream), profile=profile, **knobs
    )


# ---------------------------------------------------------------------------
# Streaming record-high alerts — the online twin of
# operators/dominance.record_highs
# ---------------------------------------------------------------------------

RECORD_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("prev_max", T.DoubleType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)

RECORD_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_max", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_eid", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)


def _record_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (k,) = key
    cur_max, last_us, last_eid, n_dis = (
        state.get if state.exists else (None, None, None, 0)
    )
    out = []
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        df = pd.concat(chunks).sort_values(["ts", "event_id"])
        for r in df.itertuples():
            t_us = int(r.ts.value) // 1000
            if last_us is not None and (
                t_us, r.event_id
            ) < (last_us, last_eid):
                # behind the key's event-time frontier: emitting would
                # rewrite already-published records — drop + count
                n_dis += 1
                continue
            if cur_max is None or r.value > cur_max:
                out.append(
                    (r.event_id, r.ts, k, r.value, cur_max, n_dis)
                )
                cur_max = r.value
            last_us, last_eid = t_us, r.event_id
    state.update((cur_max, last_us, last_eid, n_dis))
    yield pd.DataFrame(
        out,
        columns=[
            "event_id", "ts", "key", "value", "prev_max", "n_disordered",
        ],
    )


def record_high_stream(events: DataFrame) -> DataFrame:
    """O(1)-state record-high alerts per key: ONE double (the current
    maximum) plus the event-time frontier for the disorder guard.
    Monotone-emission semantics (see operators/dominance.record_highs)
    make this the rare frontier operator that IS append-streamable."""
    return events.groupBy("event_type").applyInPandasWithState(
        _record_fn,
        RECORD_OUTPUT_SCHEMA,
        RECORD_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming EWMA — the online twin of operators/anomaly.ewma_smooth
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_taps", T.IntegerType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("v6", T.ArrayType(T.LongType()))]
)


def _ewma_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Keyed ring of the last EWMA_TAPS micro-unit samples; per row
    the SAME integer dot product as the batch operator (quantized
    weights imported from the batch module so the two can never
    drift), so closed keys emit bit-identical smoothed values."""
    from ..operators.anomaly import _EWMA_D, _EWMA_W, EWMA_TAPS

    (k,) = key
    (v6,) = [list(a) for a in state.get] if state.exists else ([],)
    out = []
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        df = pd.concat(chunks).sort_values(["ts", "event_id"])
        for r in df.itertuples():
            if r.value is None or pd.isna(r.value):
                continue
            v6.append(_micro6(r.value))
            if len(v6) > EWMA_TAPS:
                v6.pop(0)
            m = len(v6)
            num = sum(x * w for x, w in zip(reversed(v6), _EWMA_W))
            ewma = num / _EWMA_D[m - 1] / 1e6
            out.append((r.event_id, r.ts, k, r.value, m, ewma))
    state.update((v6,))
    yield pd.DataFrame(
        out,
        columns=["event_id", "ts", "key", "value", "n_taps", "ewma"],
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    return events.groupBy("event_type").applyInPandasWithState(
        _ewma_fn,
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

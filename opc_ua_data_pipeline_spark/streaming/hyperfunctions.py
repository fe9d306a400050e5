"""Incremental (streaming) twins of the batch hyperfunctions.

The reference maintains its rollup-family aggregates INCREMENTALLY via
TimescaleDB continuous-aggregate refresh policies
(database/init.sql:31-34,51-54); the analytics-toolkit counterparts of
``counter_agg`` and ``heartbeat_agg`` are likewise re-computed per
refresh.  Here each becomes an ``applyInPandasWithState`` processor
keyed by metric — the same O(1)-per-key state shape as
:mod:`.alarms` — that emits the UPDATED per-metric aggregate after
every micro-batch, so a dashboard reads the latest row per metric
instead of recomputing history.

Contract (tests/test_streaming_hyperfunctions.py): fed the same rows
in event-time order, the LAST emitted row per metric equals the batch
operator in :mod:`..operators.hyperfunctions` bit-for-bit — including
the DECIMAL(38,6)-quantized delta sum, mirrored here with
``decimal.Decimal(repr(x)).quantize(1e-6, ROUND_HALF_UP)``: both
Java's ``Double.toString`` and Python's ``repr`` produce the shortest
round-trip decimal string (the same VALUE), and both engines round
half-up, so the Python accumulator is the JVM cast, exactly.

State size: counter = (last sample, decimal sum as string, counters);
uptime = (last ping, open-interval start, two counters) — O(1) per
key; at scale the state store shards by metric across executors and
nothing grows with stream length.

Disorder contract: the LOCF accumulators are only correct for rows
applied in event-time order.  Rows are sorted within each micro-batch,
but a row arriving in a LATER micro-batch with an event time behind
the key's last applied sample cannot be retro-inserted with O(1)
state — so each processor DROPS such rows and counts them in an
``n_disordered`` output column, making disorder a visible data-quality
signal instead of silent corruption (negative dt, phantom resets).
"""

from __future__ import annotations

import decimal
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.hyperfunctions import HEARTBEAT_TOLERANCE_SEC

_Q6 = decimal.Decimal("0.000001")


def _dec(x: float) -> decimal.Decimal:
    """Mirror Spark's CAST(double AS DECIMAL(38,6)): shortest-repr
    decimal value rounded half-up to 6 places."""
    return decimal.Decimal(repr(float(x))).quantize(
        _Q6, rounding=decimal.ROUND_HALF_UP
    )


COUNTER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("counter_delta", T.DoubleType()),
        T.StructField("n_resets", T.LongType()),
        T.StructField("rate_per_sec", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)
COUNTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_value", T.DoubleType()),
        T.StructField("delta_sum", T.StringType()),  # Decimal as string
        T.StructField("n_resets", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)


def _counter_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """counter_agg streaming twin: resets-aware running delta.  The
    per-sample increment rule matches operators/hyperfunctions.py
    counter_agg exactly (drop counts fully: post-reset value restarts
    from 0)."""
    (metric,) = key
    if state.exists:
        last_v, dsum_s, n_resets, first_us, last_us, n, n_dis = state.get
        dsum = decimal.Decimal(dsum_s) if dsum_s is not None else None
    else:
        last_v, dsum, n_resets, first_us, last_us, n, n_dis = (
            None,
            None,
            0,
            None,
            None,
            0,
            0,
        )
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            v = row.value_num
            if v is None or pd.isna(v):
                continue
            t_us = row.time.value // 1000
            if last_us is not None and t_us < last_us:
                # late arrival behind the applied frontier: dropping it
                # keeps the LOCF delta chain intact (a negative dt here
                # would mint a phantom reset); surfaced via n_disordered
                n_dis += 1
                continue
            if last_v is not None:
                inc = v - last_v if v >= last_v else v
                if v < last_v:
                    n_resets += 1
                d = _dec(inc)
                dsum = d if dsum is None else dsum + d
            if first_us is None:
                first_us = t_us
            last_us = t_us
            last_v = v
            n += 1
    state.update(
        (
            last_v,
            str(dsum) if dsum is not None else None,
            n_resets,
            first_us,
            last_us,
            n,
            n_dis,
        )
    )
    if n:
        delta = float(dsum) if dsum is not None else None
        rate = None
        if delta is not None:
            elapsed_sec = float(last_us - first_us) / 1e6
            # elapsed 0 (all samples at one timestamp) -> NULL rate,
            # mirroring the batch operator's try_divide
            rate = delta / elapsed_sec if elapsed_sec != 0.0 else None
        yield pd.DataFrame(
            [(metric, delta, n_resets, rate, n, n_dis)],
            columns=[
                "metric",
                "counter_delta",
                "n_resets",
                "rate_per_sec",
                "n_samples",
                "n_disordered",
            ],
        )


TWA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("time_weighted_avg", T.DoubleType()),
        T.StructField("total_weight_micros", T.LongType()),
        T.StructField("n_weighted_samples", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)
TWA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("wsum", T.StringType()),  # Decimal as string
        T.StructField("total_w", T.LongType()),
        T.StructField("n_weighted", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)


def _twa_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """time_weighted_avg streaming twin: when sample i+1 arrives, the
    HELD sample i finally has a known holding period, so its weighted
    term value_i * dt lands in the accumulator — LOCF endpoint rule
    for free (the open last sample contributes nothing until its
    successor shows up)."""
    (metric,) = key
    if state.exists:
        last_us, last_v, wsum_s, total_w, n_w, n_dis = state.get
        wsum = decimal.Decimal(wsum_s) if wsum_s is not None else None
    else:
        last_us, last_v, wsum, total_w, n_w, n_dis = (
            None,
            None,
            None,
            0,
            0,
            0,
        )
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            v = row.value_num
            if v is None or pd.isna(v):
                continue
            t_us = row.time.value // 1000
            if last_us is not None and t_us < last_us:
                # late arrival: a negative holding period would corrupt
                # the weighted sum — drop and count instead
                n_dis += 1
                continue
            if last_us is not None:
                dt = t_us - last_us
                term = _dec(last_v * float(dt))
                wsum = term if wsum is None else wsum + term
                total_w += dt
                n_w += 1
            last_us, last_v = t_us, v
    state.update(
        (
            last_us,
            last_v,
            str(wsum) if wsum is not None else None,
            total_w,
            n_w,
            n_dis,
        )
    )
    if n_w:
        yield pd.DataFrame(
            [(metric, float(wsum) / float(total_w), total_w, n_w, n_dis)],
            columns=[
                "metric",
                "time_weighted_avg",
                "total_weight_micros",
                "n_weighted_samples",
                "n_disordered",
            ],
        )


def time_weighted_avg_stream(telemetry: DataFrame) -> DataFrame:
    return (
        telemetry.filter("value_num IS NOT NULL")
        .groupBy("metric")
        .applyInPandasWithState(
            _twa_fn,
            TWA_OUTPUT_SCHEMA,
            TWA_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


UPTIME_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("n_intervals", T.LongType()),
        T.StructField("uptime_micros", T.LongType()),
        T.StructField("n_pings", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)
UPTIME_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("n_intervals", T.LongType()),
        T.StructField("closed_micros", T.LongType()),
        T.StructField("n_pings", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)


def _uptime_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """uptime_agg streaming twin: merged live intervals with the
    heartbeat-tolerance gap split; all arithmetic is exact integer
    microseconds, so stream == batch bit-for-bit."""
    (metric,) = key
    tol_us = HEARTBEAT_TOLERANCE_SEC * 1_000_000
    if state.exists:
        last_us, start_us, n_intervals, closed, n_pings, n_dis = state.get
    else:
        last_us, start_us, n_intervals, closed, n_pings, n_dis = (
            None,
            None,
            0,
            0,
            0,
            0,
        )
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            t_us = row.time.value // 1000
            if last_us is not None and t_us < last_us:
                # late ping behind the frontier: already inside (or
                # before) the open interval — drop and count
                n_dis += 1
                continue
            if last_us is None or t_us - last_us > tol_us:
                if start_us is not None:
                    closed += last_us - start_us
                n_intervals += 1
                start_us = t_us
            last_us = t_us
            n_pings += 1
    state.update((last_us, start_us, n_intervals, closed, n_pings, n_dis))
    if n_pings:
        open_span = (last_us - start_us) if start_us is not None else 0
        yield pd.DataFrame(
            [(metric, n_intervals, closed + open_span, n_pings, n_dis)],
            columns=[
                "metric",
                "n_intervals",
                "uptime_micros",
                "n_pings",
                "n_disordered",
            ],
        )


STATE_DUR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("operator", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("duration_micros", T.LongType()),
        T.StructField("n_entries", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("op_samples", T.LongType()),  # snapshot marker
        T.StructField("n_disordered", T.LongType()),
    ]
)
#: per-operator accumulators as parallel arrays (state cardinality is
#: the metric-type count — O(#states) per key, bounded, not
#: stream-length-dependent)
STATE_DUR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_state", T.StringType()),
        T.StructField("states", T.ArrayType(T.StringType())),
        T.StructField("durations", T.ArrayType(T.LongType())),
        T.StructField("entries", T.ArrayType(T.LongType())),
        T.StructField("samples", T.ArrayType(T.LongType())),
        T.StructField("n_disordered", T.LongType()),
    ]
)


def _state_dur_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """state_durations streaming twin: when the next sample arrives,
    the HELD state's duration closes (LOCF), an entry is counted when
    the arriving state differs from the held one.  Emits the full
    per-state snapshot each micro-batch, tagged with the operator's
    cumulative sample count so tests can pick the final snapshot."""
    (operator,) = key
    if state.exists:
        last_us, last_state, names, durs, ents, samps, n_dis = state.get
        names, durs, ents, samps = (
            list(names),
            list(durs),
            list(ents),
            list(samps),
        )
    else:
        last_us, last_state, names, durs, ents, samps, n_dis = (
            None,
            None,
            [],
            [],
            [],
            [],
            0,
        )
    idx = {s: i for i, s in enumerate(names)}

    def slot(s):
        if s not in idx:
            idx[s] = len(names)
            names.append(s)
            durs.append(0)
            ents.append(0)
            samps.append(0)
        return idx[s]

    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            st = row.metric
            t_us = row.time.value // 1000
            if last_us is not None and t_us < last_us:
                # late state sample: retro-splitting a closed holding
                # period needs unbounded state — drop and count
                n_dis += 1
                continue
            if last_state is not None:
                durs[slot(last_state)] += t_us - last_us
            i = slot(st)
            if last_state is None or last_state != st:
                ents[i] += 1
            samps[i] += 1
            last_us, last_state = t_us, st
    state.update((last_us, last_state, names, durs, ents, samps, n_dis))
    total = sum(samps)
    if names:
        yield pd.DataFrame(
            [
                (operator, s, durs[i], ents[i], samps[i], total, n_dis)
                for i, s in enumerate(names)
            ],
            columns=[
                "operator",
                "state",
                "duration_micros",
                "n_entries",
                "n_samples",
                "op_samples",
                "n_disordered",
            ],
        )


def state_durations_stream(telemetry: DataFrame) -> DataFrame:
    return (
        telemetry.filter("operator IS NOT NULL")
        .groupBy("operator")
        .applyInPandasWithState(
            _state_dur_fn,
            STATE_DUR_OUTPUT_SCHEMA,
            STATE_DUR_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def counter_agg_stream(telemetry: DataFrame) -> DataFrame:
    return (
        telemetry.filter("value_num IS NOT NULL")
        .groupBy("metric")
        .applyInPandasWithState(
            _counter_fn,
            COUNTER_OUTPUT_SCHEMA,
            COUNTER_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def uptime_agg_stream(telemetry: DataFrame) -> DataFrame:
    return telemetry.groupBy("metric").applyInPandasWithState(
        _uptime_fn,
        UPTIME_OUTPUT_SCHEMA,
        UPTIME_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


GAPFILL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("bucket", T.TimestampType()),
        T.StructField("avg_value", T.DoubleType()),
        T.StructField("is_gap", T.BooleanType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)
GAPFILL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_bucket_us", T.LongType()),
        T.StructField("open_sum", T.StringType()),  # Decimal as string
        T.StructField("open_cnt", T.LongType()),
        T.StructField("last_avg", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)

_MIN_US = 60_000_000


def _gapfill_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """time_bucket_gapfill streaming twin: a minute bucket CLOSES when a row
    from a later bucket arrives; closing emits the observed bucket's
    average (per-sample DECIMAL(38,6) accumulation — the batch cast,
    exactly) followed by LOCF gap rows for every empty minute up to,
    but not including, the newly opened bucket.  The stream's emitted
    prefix equals the batch operator on every bucket strictly before
    each metric's last observed bucket; the open tail bucket stays in
    state (append semantics — same contract as the windowed rollups).
    """
    (metric,) = key
    if state.exists:
        open_us, sum_s, cnt, last_avg, last_us, n_dis = state.get
        sm = decimal.Decimal(sum_s) if sum_s is not None else None
    else:
        open_us, sm, cnt, last_avg, last_us, n_dis = (
            None,
            None,
            0,
            None,
            None,
            0,
        )
    out: list[tuple] = []

    def close_through(new_bucket_us: int) -> None:
        """Emit the open bucket, then LOCF gaps up to new_bucket_us."""
        nonlocal open_us, sm, cnt, last_avg
        avg = float(sm) / cnt
        out.append((metric, open_us, avg, False))
        last_avg = avg
        g = open_us + _MIN_US
        while g < new_bucket_us:
            out.append((metric, g, last_avg, True))
            g += _MIN_US
        open_us, sm, cnt = new_bucket_us, None, 0

    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            v = row.value_num
            if v is None or pd.isna(v):
                continue
            t_us = row.time.value // 1000
            if last_us is not None and t_us < last_us:
                n_dis += 1
                continue
            last_us = t_us
            b_us = t_us - t_us % _MIN_US
            if open_us is None:
                open_us = b_us
            elif b_us > open_us:
                close_through(b_us)
            d = _dec(v)
            sm = d if sm is None else sm + d
            cnt += 1
    state.update(
        (
            open_us,
            str(sm) if sm is not None else None,
            cnt,
            last_avg,
            last_us,
            n_dis,
        )
    )
    if out:
        yield pd.DataFrame(
            [
                (m, pd.Timestamp(us * 1000), a, g, n_dis)
                for m, us, a, g in out
            ],
            columns=[
                "metric",
                "bucket",
                "avg_value",
                "is_gap",
                "n_disordered",
            ],
        )


def gapfill_locf_stream(telemetry: DataFrame) -> DataFrame:
    return (
        telemetry.filter("value_num IS NOT NULL")
        .groupBy("metric")
        .applyInPandasWithState(
            _gapfill_fn,
            GAPFILL_OUTPUT_SCHEMA,
            GAPFILL_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


GAPFILL_INTERP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_bucket_us", T.LongType()),
        T.StructField("open_sum", T.StringType()),  # Decimal as string
        T.StructField("open_cnt", T.LongType()),
        T.StructField("prev_bucket_us", T.LongType()),
        T.StructField("prev_avg", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)


def _gapfill_interp_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """gapfill_interpolate streaming twin: LINEAR interpolation needs
    BOTH anchors, so a gap's rows are emitted at the moment its
    right-hand observed bucket closes — later than the LOCF twin
    emits them (which needs only the left anchor), but still exactly
    once and in bucket order per metric.  The interpolation weight is
    the same exact integer second ratio as the batch operator, so
    emitted rows equal ``gapfill_interpolate`` bit-for-bit.

    State adds one (bucket, avg) pair over the LOCF twin — still O(1)
    per metric.
    """
    (metric,) = key
    if state.exists:
        open_us, sum_s, cnt, prev_us, prev_avg, last_us, n_dis = state.get
        sm = decimal.Decimal(sum_s) if sum_s is not None else None
    else:
        open_us, sm, cnt, prev_us, prev_avg, last_us, n_dis = (
            None,
            None,
            0,
            None,
            None,
            None,
            0,
        )
    out: list[tuple] = []

    def close_through(new_bucket_us: int) -> None:
        """Close the open bucket: emit pending gap rows (we now hold
        their right anchor), then the observed bucket itself."""
        nonlocal open_us, sm, cnt, prev_us, prev_avg
        avg = float(sm) / cnt
        if prev_us is not None:
            g = prev_us + _MIN_US
            dT = float((open_us - prev_us) // 1_000_000)
            while g < open_us:
                dt = float((g - prev_us) // 1_000_000)
                interp = prev_avg + (avg - prev_avg) * (dt / dT)
                out.append((metric, g, interp, True))
                g += _MIN_US
        out.append((metric, open_us, avg, False))
        prev_us, prev_avg = open_us, avg
        open_us, sm, cnt = new_bucket_us, None, 0

    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            v = row.value_num
            if v is None or pd.isna(v):
                continue
            t_us = row.time.value // 1000
            if last_us is not None and t_us < last_us:
                n_dis += 1
                continue
            last_us = t_us
            b_us = t_us - t_us % _MIN_US
            if open_us is None:
                open_us = b_us
            elif b_us > open_us:
                close_through(b_us)
            d = _dec(v)
            sm = d if sm is None else sm + d
            cnt += 1
    state.update(
        (
            open_us,
            str(sm) if sm is not None else None,
            cnt,
            prev_us,
            prev_avg,
            last_us,
            n_dis,
        )
    )
    if out:
        yield pd.DataFrame(
            [
                (m, pd.Timestamp(us * 1000), a, g, n_dis)
                for m, us, a, g in out
            ],
            columns=[
                "metric",
                "bucket",
                "avg_value",
                "is_gap",
                "n_disordered",
            ],
        )


def gapfill_interpolate_stream(telemetry: DataFrame) -> DataFrame:
    return (
        telemetry.filter("value_num IS NOT NULL")
        .groupBy("metric")
        .applyInPandasWithState(
            _gapfill_interp_fn,
            GAPFILL_OUTPUT_SCHEMA,  # same shape as the LOCF twin
            GAPFILL_INTERP_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


TREND_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("slope_per_sec", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)
TREND_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t0_us", T.LongType()),
        T.StructField("sx", T.StringType()),  # Decimal(38,6) sums as strings
        T.StructField("sy", T.StringType()),
        T.StructField("sxy", T.StringType()),
        T.StructField("sxx", T.StringType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)

_Q12 = decimal.Decimal("1e-12")


def _round12(x: float) -> float:
    """Mirror the batch CAST(DECIMAL(38,12)) ulp-collapse on the
    published slope/intercept (operators/hyperfunctions.py
    trend_slope): shortest-repr value, half-up at 12 places, back to
    double."""
    return float(
        decimal.Decimal(repr(float(x))).quantize(
            _Q12, rounding=decimal.ROUND_HALF_UP
        )
    )


def _trend_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """trend_slope streaming twin: incremental least-squares drift.

    The four raw moments are order-independent sums, so the only
    sequential dependency is the x-origin: batch re-centers on the
    per-metric MIN sample time, and under the event-time-order
    contract (disordered rows dropped + counted, as in every
    processor here) the first APPLIED sample IS that minimum — any
    row that could lower it would arrive behind the frontier and be
    dropped.  Each term is quantized to DECIMAL(38,6) before summing
    (the batch associativity contract), the sums collapse to double,
    and the closed form + DECIMAL(38,12) rounding replays the batch
    textual order exactly."""
    # x*x terms reach ~1e22 — quantized to 6 places that's >28
    # significant digits, past Python's DEFAULT decimal context (the
    # small-delta processors above never get near it).  Spark's
    # DECIMAL(38,6) sum is exact to 38 digits; a 60-digit local
    # context keeps every add exact within that envelope and is
    # restored on exit (other processors keep the default).
    (metric,) = key
    with decimal.localcontext() as c:
        c.prec = 60
        yield from _trend_body(metric, pdfs, state)


def _trend_body(
    metric: str, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        t0_us, sx_s, sy_s, sxy_s, sxx_s, last_us, n, n_dis = state.get
        sx = decimal.Decimal(sx_s)
        sy = decimal.Decimal(sy_s)
        sxy = decimal.Decimal(sxy_s)
        sxx = decimal.Decimal(sxx_s)
    else:
        t0_us, last_us, n, n_dis = None, None, 0, 0
        sx = sy = sxy = sxx = decimal.Decimal(0)
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            v = row.value_num
            if v is None or pd.isna(v):
                continue
            t_us = row.time.value // 1000
            if last_us is not None and t_us < last_us:
                # behind the applied frontier: a retro-sample could
                # also undercut t0 and shift every x — drop + count
                n_dis += 1
                continue
            if t0_us is None:
                t0_us = t_us
            x = float(t_us - t0_us)
            v = float(v)
            sx += _dec(x)
            sy += _dec(v)
            sxy += _dec(x * v)
            sxx += _dec(x * x)
            last_us = t_us
            n += 1
    state.update(
        (t0_us, str(sx), str(sy), str(sxy), str(sxx), last_us, n, n_dis)
    )
    if n:
        sx_d, sy_d, sxy_d, sxx_d = float(sx), float(sy), float(sxy), float(sxx)
        nd = float(n)
        denom = nd * sxx_d - sx_d * sx_d
        if denom == 0.0:
            slope_sec = intercept = None  # batch try_divide -> NULL
        else:
            slope_micro = (nd * sxy_d - sx_d * sy_d) / denom
            slope_sec = _round12(slope_micro * 1e6)
            intercept = _round12((sy_d - slope_micro * sx_d) / nd)
        yield pd.DataFrame(
            [(metric, slope_sec, intercept, n, n_dis)],
            columns=[
                "metric",
                "slope_per_sec",
                "intercept",
                "n_samples",
                "n_disordered",
            ],
        )


def trend_slope_stream(telemetry: DataFrame) -> DataFrame:
    return (
        telemetry.filter("value_num IS NOT NULL")
        .groupBy("metric")
        .applyInPandasWithState(
            _trend_fn,
            TREND_OUTPUT_SCHEMA,
            TREND_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# lttb_time_bucketed streaming twin — the last hyperfunction twin
# ---------------------------------------------------------------------------

LTTB_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("bucket", T.TimestampType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

#: pending bucket = closed, awaiting its successor's average; open
#: bucket = still receiving rows.  Point arrays are bounded by one
#: bucket's row count (the same per-bucket state bound as the gapfill
#: twins' per-bucket sums, plus the points LTTB selection inherently
#: needs).
LTTB_STATE_SCHEMA = T.StructType(
    [
        T.StructField("anchor_ax", T.DoubleType()),
        T.StructField("anchor_ay", T.DoubleType()),
        T.StructField("pend_bkt", T.LongType()),
        T.StructField("pend_ax", T.DoubleType()),
        T.StructField("pend_ay", T.DoubleType()),
        T.StructField("pend_xs", T.ArrayType(T.LongType())),
        T.StructField("pend_vs", T.ArrayType(T.DoubleType())),
        T.StructField("pend_keys", T.ArrayType(T.StringType())),
        T.StructField("open_bkt", T.LongType()),
        T.StructField("open_xs", T.ArrayType(T.LongType())),
        T.StructField("open_vs", T.ArrayType(T.DoubleType())),
        T.StructField("open_keys", T.ArrayType(T.StringType())),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_disordered", T.LongType()),
    ]
)

_LTTB_STEP_US = 3600 * 1_000_000  # = hyperfunctions.LTTB_TB_BUCKET_SEC


def _lttb_avg(xs: list, vs: list) -> tuple:
    """Mirror the batch averages exactly: exact integer micros sum and
    exact DECIMAL(28,6) value sum, each cast to double then divided by
    the count (CAST(SUM(..) AS DOUBLE) / COUNT(*))."""
    ax = float(sum(xs)) / len(xs)
    s = decimal.Decimal(0)
    for v in vs:
        s += _dec(v)
    return ax, float(s) / len(vs)


def _lttb_okey(x_us: int, event_id: int) -> str:
    return f"{x_us:020d}-{event_id:020d}"


def _lttb_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """lttb_time_bucketed streaming twin: a bucket CLOSES when a row
    from a later bucket arrives, but is EMITTED only when its
    SUCCESSOR closes — selection needs the next non-empty bucket's
    average (the reference point), which is final exactly then.  A
    metric's first bucket needs no selection (strict LTTB keeps its
    first sample) and is emitted at its own close.  The emitted
    prefix equals the batch operator on every bucket whose successor
    has closed; the open tail + the pending bucket stay in state
    (append semantics, the gapfill twins' contract).

    Area/average arithmetic mirrors the batch expressions op-for-op
    in IEEE double (same order), on the same exact inputs — so the
    twin is bit-identical, not approximately equal.
    """
    (metric,) = key
    if state.exists:
        (
            a_ax,
            a_ay,
            p_bkt,
            p_ax,
            p_ay,
            p_xs,
            p_vs,
            p_keys,
            o_bkt,
            o_xs,
            o_vs,
            o_keys,
            last_us,
            n_dis,
        ) = state.get
        p_xs, p_vs, p_keys = list(p_xs or []), list(p_vs or []), list(p_keys or [])
        o_xs, o_vs, o_keys = list(o_xs or []), list(o_vs or []), list(o_keys or [])
    else:
        a_ax = a_ay = p_bkt = p_ax = p_ay = o_bkt = last_us = None
        p_xs, p_vs, p_keys = [], [], []
        o_xs, o_vs, o_keys = [], [], []
        n_dis = 0
    out: list[tuple] = []

    def emit(bkt: int, x_us: int, v: float) -> None:
        out.append((metric, bkt, x_us, v))

    def select_pending(xn: float, yn: float) -> None:
        """Largest triangle vs (anchor, next avg), min-okey tiebreak —
        the batch MAX(area) + equality + min_by(okey) spelling."""
        best = None
        for x, v, okey in zip(p_xs, p_vs, p_keys):
            area = abs(
                (a_ax - xn) * (v - a_ay) - (a_ax - float(x)) * (yn - a_ay)
            )
            if (
                best is None
                or area > best[0]
                or (area == best[0] and okey < best[1])
            ):
                best = (area, okey, x, v)
        emit(p_bkt, best[2], best[3])

    def close_open(new_bkt: int) -> None:
        nonlocal a_ax, a_ay, p_bkt, p_ax, p_ay, p_xs, p_vs, p_keys
        nonlocal o_bkt, o_xs, o_vs, o_keys
        ax, ay = _lttb_avg(o_xs, o_vs)
        if p_bkt is not None:
            select_pending(ax, ay)
            a_ax, a_ay = p_ax, p_ay
            p_bkt, p_ax, p_ay = o_bkt, ax, ay
            p_xs, p_vs, p_keys = o_xs, o_vs, o_keys
        elif a_ax is None:
            # the metric's FIRST bucket: strict LTTB keeps its first
            # sample; it then serves as the next bucket's anchor
            emit(o_bkt, o_xs[0], o_vs[0])
            a_ax, a_ay = ax, ay
        else:
            p_bkt, p_ax, p_ay = o_bkt, ax, ay
            p_xs, p_vs, p_keys = o_xs, o_vs, o_keys
        o_bkt, o_xs, o_vs, o_keys = new_bkt, [], [], []

    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["time", "event_id"])
        for row in pdf.itertuples():
            v = row.value_num
            if v is None or pd.isna(v):
                continue
            t_us = row.time.value // 1000
            if last_us is not None and t_us < last_us:
                n_dis += 1
                continue
            last_us = t_us
            b = t_us // _LTTB_STEP_US
            if o_bkt is None:
                o_bkt = b
            elif b > o_bkt:
                close_open(b)
            o_xs.append(t_us)
            o_vs.append(float(v))
            o_keys.append(_lttb_okey(t_us, int(row.event_id)))
    state.update(
        (
            a_ax,
            a_ay,
            p_bkt,
            p_ax,
            p_ay,
            p_xs,
            p_vs,
            p_keys,
            o_bkt,
            o_xs,
            o_vs,
            o_keys,
            last_us,
            n_dis,
        )
    )
    if out:
        yield pd.DataFrame(
            [
                (
                    m,
                    pd.Timestamp(bkt * _LTTB_STEP_US * 1000),
                    pd.Timestamp(x_us * 1000),
                    v,
                )
                for m, bkt, x_us, v in out
            ],
            columns=["metric", "bucket", "time", "value"],
        )


def lttb_stream(telemetry: DataFrame) -> DataFrame:
    return (
        telemetry.filter("value_num IS NOT NULL")
        .groupBy("metric")
        .applyInPandasWithState(
            _lttb_fn,
            LTTB_OUTPUT_SCHEMA,
            LTTB_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )

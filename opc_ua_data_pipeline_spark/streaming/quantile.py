"""Bounded-state online quantile sketch — the production-shape
complement of ``streaming/rollup.streaming_hour_quantile_partials``.

The closed-hour twin buffers the open hour's values to stay
bit-identical to the batch partial; THIS processor is the other side
of that documented trade: a deterministic KLL-style compactor stack
(Karnin-Lang-Liberty 2016 structure, Munro-Paterson-style
deterministic every-other compaction instead of coin flips) whose
state is O(cap · #levels) per key FOREVER — it never buffers the
stream — at the cost of a rank-ERROR envelope instead of
bit-exactness.

Structure: items live at levels; an item at level ``l`` stands for
``2^l`` raw values.  New values enter at level 0; when a level
exceeds ``cap`` items it is sorted and every other item is promoted
to the next level, halving the count.  When the buffer is ODD-sized
one item (the max) is carried over AT its level — promoting
ceil(len/2) items at doubled weight would inflate the sketch's
represented weight past the exact ``n`` the ``ceil(q*n)`` rank read
uses (classic KLL/Munro-Paterson leaves the odd leftover at its
level).  The promoted offsets alternate between even and odd per
compaction (a compaction counter rides in the state), so the sketch
carries no systematic keep-the-minimum bias yet stays fully
deterministic: replays rebuild the identical sketch because the
counter replays with it.  A compaction at level ``l``
perturbs any rank by at most ``2^l``, and at most
``ceil(n / (cap · 2^l))`` compactions can happen at level ``l`` (each
consumes ``cap`` items of weight ``2^l``), so the total rank error of
any quantile read is bounded by

    sum_l  ceil(n / (cap · 2^l)) · 2^l  <=  n · L / cap + 2^(L+1)

with ``L <= log2(n / cap) + 2`` levels — the envelope
tests/test_streaming_quantile.py pins (the randomized KLL bound is
tighter, O(1/eps · sqrt(log 1/eps)) space, but needs coordinated
randomness; determinism is what makes the stream replayable and the
test exact).

Emits one row per key per micro-batch (latest ``seq`` = the serving
row): exact ``n`` (weights telescope — counts are never approximated),
p50/p95 estimates read off the weighted item multiset.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: compactor buffer capacity per level (state <= cap * levels items
#: per key; levels grow logarithmically with stream length)
KLL_CAP = 128

KLLQ_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("n_state_items", T.IntegerType()),
        T.StructField("p50_est", T.DoubleType()),
        T.StructField("p95_est", T.DoubleType()),
    ]
)

KLLQ_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("lvls", T.ArrayType(T.IntegerType())),
        T.StructField("n", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ncomp", T.LongType()),
    ]
)


def _compact(levels: dict[int, list], cap: int, ncomp: int) -> int:
    """Promote every-other item of the sorted buffer from any level
    over capacity.  Weight-exact: an odd-sized buffer carries its max
    over AT the level (promoting ceil(len/2) at doubled weight would
    over-count), so the represented weight always equals the exact
    ``n``.  The promoted parity alternates per compaction — no
    systematic min/max-keeping bias — and the compaction counter is
    state, so a replayed stream rebuilds the identical sketch."""
    l = 0
    while l <= max(levels, default=0):
        buf = levels.get(l, [])
        if len(buf) > cap:
            buf.sort()
            if len(buf) % 2:
                levels[l] = [buf[-1]]
                buf = buf[:-1]
            else:
                levels[l] = []
            levels[l + 1] = levels.get(l + 1, []) + buf[ncomp % 2 :: 2]
            ncomp += 1
        l += 1
    return ncomp


def _read_quantiles(levels: dict[int, list], n: int, qs) -> list[float]:
    items = sorted(
        (v, 1 << l) for l, buf in levels.items() for v in buf
    )
    out = []
    for q in qs:
        k = max(1, math.ceil(q * n))
        cum = 0
        est = items[-1][0] if items else None
        for v, w in items:
            cum += w
            if cum >= k:
                est = v
                break
        out.append(est)
    return out


def kll_quantile_stream(
    events: DataFrame, cap: int = KLL_CAP
) -> DataFrame:
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (et,) = key
        levels: dict[int, list] = {}
        if state.exists:
            vals, lvls, n, seq, ncomp = state.get
            for v, l in zip(vals, lvls):
                levels.setdefault(int(l), []).append(float(v))
        else:
            n, seq, ncomp = 0, 0, 0
        for chunk in pdfs:
            vs = chunk["value"].dropna()
            levels.setdefault(0, []).extend(float(v) for v in vs)
            n += int(len(vs))
            ncomp = _compact(levels, cap, ncomp)
            seq += 1
        flat = [(v, l) for l, buf in levels.items() for v in buf]
        state.update(
            (
                [v for v, _ in flat],
                [l for _, l in flat],
                n,
                seq,
                ncomp,
            )
        )
        if n == 0:
            yield pd.DataFrame(
                [],
                columns=[
                    "event_type", "seq", "n", "n_state_items",
                    "p50_est", "p95_est",
                ],
            )
            return
        p50, p95 = _read_quantiles(levels, n, (0.5, 0.95))
        yield pd.DataFrame(
            [(et, seq, n, len(flat), p50, p95)],
            columns=[
                "event_type", "seq", "n", "n_state_items",
                "p50_est", "p95_est",
            ],
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        KLLQ_OUTPUT_SCHEMA,
        KLLQ_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

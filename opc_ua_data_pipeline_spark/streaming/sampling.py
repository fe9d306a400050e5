"""Streaming weighted sample — the online twin of
operators/sampling.weighted_sample_topk.

Sequential Poisson sampling (Ohlsson) is the rare weighted-sample
scheme that streams for free: each row's priority ``q = u / w`` is a
pure deterministic function of the row (u from the md5 of its key —
the SAME integer + power-of-two-divide + one IEEE division as the
batch operator, all error-free or correctly rounded), so the sample
"keep the k smallest priorities" is an order-independent, mergeable
top-k — O(k) state forever, no randomness to coordinate, and the
final emitted sample is BIT-IDENTICAL to the batch operator on the
same rows regardless of micro-batching (tests/test_streaming_mg.py's
twin pattern; pinned by tests/test_streaming_sampling.py).

Robustness beyond the happy path: NULL keys are skipped (their batch
priority is NULL), NULL/degenerate weights coerce to the batch's
``greatest(weight, 1)`` (the emitted weight is the coerced one), and
a re-delivered duplicate key occupies ONE sample slot — at-least-once
delivery cannot inflate the sample.

After every micro-batch the processor emits the current sample with
its ``seq`` number, so a dashboard reads the latest seq — the
update-mode serving shape of the batch query.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sampling import WEIGHTED_SAMPLE_K

WS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("weight", T.LongType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("sample_rank", T.IntegerType()),
    ]
)

WS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("weights", T.ArrayType(T.LongType())),
        T.StructField("prios", T.ArrayType(T.DoubleType())),
        T.StructField("seq", T.LongType()),
    ]
)


def _priority_py(key_val, weight, salt: str) -> float:
    """Python twin of the batch priority: u exact (md5 first 8 hex
    chars + 1, over 2^32), q one IEEE division — bit-identical to
    Spark's conv/substring/md5 spelling."""
    h = int(
        hashlib.md5(f"{key_val}:{salt}".encode()).hexdigest()[:8], 16
    )
    u = (h + 1.0) / 4294967296.0
    return u / max(float(weight), 1.0)


def weighted_sample_stream(
    docs: DataFrame,
    weight_col: str = "n_chars",
    key: str = "doc_id",
    k: int = WEIGHTED_SAMPLE_K,
    salt: str = "ws",
) -> DataFrame:
    def fn(
        _key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, weights, prios, seq = state.get
            items = list(zip(prios, ids, weights))
        else:
            items, seq = [], 0
        for chunk in pdfs:
            for kid, w in zip(chunk[key], chunk[weight_col]):
                # NULL keys carry no identity — skipped, exactly as
                # the batch operator's isNotNull filter; NULL weights
                # mirror the batch ``greatest(weight, 1)`` (greatest
                # skips NULLs) instead of raising int(NaN).
                if pd.isna(kid):
                    continue
                wv = 1 if pd.isna(w) else max(int(w), 1)
                items.append((_priority_py(int(kid), wv, salt), int(kid), wv))
            seq += 1
        # the sample is the k smallest (priority, key) — the batch
        # operator's exact sort key, so ties break identically.  A
        # re-delivered duplicate key (at-least-once sources) must not
        # occupy two sample slots: keep ONE item per key (the smallest
        # priority — deterministic first after the sort), i.e. the
        # twin's identity unit is the key, exactly-once per key.
        items.sort(key=lambda t: (t[0], t[1]))
        seen: set = set()
        uniq = []
        for it in items:
            if it[1] not in seen:
                seen.add(it[1])
                uniq.append(it)
                if len(uniq) == k:
                    break
        items = uniq
        state.update(
            (
                [i for _, i, _ in items],
                [w for _, _, w in items],
                [p for p, _, _ in items],
                seq,
            )
        )
        yield pd.DataFrame(
            [
                (seq, i, w, p, r + 1)
                for r, (p, i, w) in enumerate(items)
            ],
            columns=["seq", "doc_id", "weight", "priority", "sample_rank"],
        )

    # ONE state group: the sample itself is k rows, so a single
    # O(k)-state group is the correct shape (the per-partition
    # parallelism lives in the upstream scan; the stateful merge is
    # k-bounded work per batch).  pmod keeps the key non-foldable.
    keyed = docs.select(
        F.pmod(F.xxhash64(key), F.lit(1)).cast("int").alias("_g"),
        F.col(key),
        F.col(weight_col),
    )
    return keyed.groupBy("_g").applyInPandasWithState(
        fn,
        WS_OUTPUT_SCHEMA,
        WS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

"""Streaming sketches — the online twins of operators/sketch.py
(KMV distinct-count state; Misra-Gries heavy-hitter candidates).

A distinct-count sketch is the canonical streaming-friendly state:
O(k) per key forever, insert-only, order-independent.  Each arriving
value hashes with the SAME md5-prefix 60-bit hash as the batch
operator (Python ``int(md5[:15], 16)`` ≡ Spark
``conv(substr(md5, 1, 15), 16, 10)`` — both read the same 15 hex
chars), and the state keeps the k smallest distinct hashes as a
sorted list.  After every micro-batch the processor emits the updated
per-key estimate row, so a dashboard reads the latest row per key —
the update-mode serving shape of the batch ``kmv_distinct``.

Because insertion is a set-union + cut (associative, commutative),
there is NO disorder contract here: arrival order cannot change the
sketch — the property pinned by the batch merge-identity test, now
doing streaming duty.  Fed any permutation of the same rows, the
final emitted row per key equals batch ``kmv_distinct`` exactly
(minus the exact_distinct column, whose unbounded state is exactly
what the sketch exists to avoid).
"""

from __future__ import annotations

import bisect
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketch import KMV_K, _TWO60

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_sketch", T.IntegerType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("distinct_est", T.DoubleType()),
    ]
)

KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("sketch", T.ArrayType(T.LongType()))]
)


def _h60_py(v, salt: str) -> int:
    """Python twin of sketch._h60 (same md5 prefix, same 60 bits)."""
    return int(
        hashlib.md5(f"{v}:{salt}".encode()).hexdigest()[:15], 16
    )


def kmv_distinct_stream(events: DataFrame, salt: str = "kmv") -> DataFrame:
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        sk = list(state.get[0]) if state.exists else []
        for chunk in pdfs:
            for v in chunk["user_id"]:
                h = _h60_py(int(v), salt)
                i = bisect.bisect_left(sk, h)
                if i < len(sk) and sk[i] == h:
                    continue
                if len(sk) < KMV_K:
                    sk.insert(i, h)
                elif h < sk[-1] and i < KMV_K:
                    sk.insert(i, h)
                    sk.pop()
        state.update((sk,))
        n = len(sk)
        if n == 0:
            yield pd.DataFrame(
                [], columns=["event_type", "n_sketch", "kth_hash", "distinct_est"]
            )
            return
        kth = sk[-1]
        est = float(n) if n < KMV_K else (KMV_K - 1) / (float(kth) / _TWO60)
        yield pd.DataFrame(
            [(k, n, kth, est)],
            columns=["event_type", "n_sketch", "kth_hash", "distinct_est"],
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        KMV_OUTPUT_SCHEMA,
        KMV_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries — the online twin of sketch.heavy_hitter_bigrams'
# candidate pass
# ---------------------------------------------------------------------------

#: state groups for the streaming MG pass — the streaming stand-in
#: for the batch pass's input partitions.  Per-group state is one
#: k-bounded histogram; candidates are the union of survivors, so the
#: pigeonhole no-false-negative argument of heavy_hitter_bigrams
#: (any globally phi-heavy item has share > 1/k in at least one
#: group's substream when k > 1/phi) carries over unchanged.
MG_STREAM_GROUPS = 8

MG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.IntegerType()),
        T.StructField("n_batches", T.LongType()),
        T.StructField("candidates", T.ArrayType(T.StringType())),
    ]
)

MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bgs", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("nb", T.LongType()),
    ]
)


def mg_candidates_stream(
    docs: DataFrame, k: int | None = None, groups: int = MG_STREAM_GROUPS
) -> DataFrame:
    """Streaming Misra-Gries heavy-hitter CANDIDATES over a document
    stream — the online twin of ``operators/sketch._mg_candidates``.

    State per group is the k-bounded MG histogram itself — O(k)
    forever, the textbook mergeable summary (Agarwal et al. 2013 §3,
    cited at the batch pass).  Each micro-batch is counted EXACTLY
    with the shared vectorized kernel (``sketch._bigram_counts``) and
    MG-merged into the state via the shared ``sketch._mg_reduce`` —
    bitwise the same arithmetic as the batch pass, so the streamed
    summary is a valid MG summary of the full stream regardless of
    how the input was micro-batched.  After every batch each group
    emits ONE row holding its current survivor set; the final row per
    group is the stream's candidate set, and feeding the union into
    ``sketch.verify_heavy_hitters`` (pass 2 unchanged) returns output
    IDENTICAL to batch ``heavy_hitter_bigrams`` — pinned by
    tests/test_streaming_mg.py.
    """
    from ..operators.sketch import MG_K, _bigram_counts, _mg_reduce

    kk = k or MG_K
    keyed = docs.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(groups))
        .cast("int")
        .alias("grp"),
        "text",
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (grp,) = key
        if state.exists:
            bgs, counts, nb = state.get
            counters = pd.Series(
                list(counts), index=list(bgs), dtype="int64"
            )
        else:
            counters, nb = pd.Series(dtype="int64"), 0
        for chunk in pdfs:
            counters = _mg_reduce(
                counters, _bigram_counts(chunk["text"]), kk
            )
            nb += 1
        state.update(
            (
                [str(b) for b in counters.index],
                [int(c) for c in counters.values],
                nb,
            )
        )
        yield pd.DataFrame(
            [(grp, nb, [str(b) for b in counters.index])],
            columns=["grp", "n_batches", "candidates"],
        )

    return keyed.groupBy("grp").applyInPandasWithState(
        fn,
        MG_OUTPUT_SCHEMA,
        MG_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

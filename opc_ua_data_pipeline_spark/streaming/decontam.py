"""Streaming embedding-space decontamination — the online twin of
operators/similarity.embedding_decontamination (round-8 verdict
item 4).

The batch audit's benchmark side is static/broadcast BY CONSTRUCTION
(eval suites are small), so the streaming split is natural:

* the HOT pair stage stays JVM-side: each arriving training vector
  computes its sign-LSH bucket + norm in the scan projection and
  stream-static-joins the BROADCAST benchmark slice of its bucket —
  the exact `_pair_score` expression of the batch operator, so
  per-pair scores are bit-identical doubles;
* the keyed state holds, per flagged vector, the SET of benchmark ids
  already counted (with their scores) — the running flag set.  State
  is bounded by the vector's bucket's benchmark slice (benchmark-
  proportional, never corpus-proportional), and merging by b_id makes
  at-least-once redelivery IDEMPOTENT: a re-delivered vector re-joins
  the same benchmark rows and the set union absorbs them, where a
  blind count would double.

Each touched key emits its current (n_bench_hits, max_score) per
micro-batch; the latest row per key equals the batch audit row for
that vector (asserted batch≡stream in
tests/test_streaming_decontam.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.similarity import (
    DECON_BENCH_MOD,
    DECON_THRESHOLD,
    _norm,
    _pair_score,
    sign_bucket,
)

DECON_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("n_bench_hits", T.LongType()),
        T.StructField("max_score", T.DoubleType()),
    ]
)

DECON_STATE_SCHEMA = T.StructType(
    [
        T.StructField("b_ids", T.ArrayType(T.LongType())),
        T.StructField("scores", T.ArrayType(T.DoubleType())),
        T.StructField("seq", T.LongType()),
    ]
)


def bench_side(corpus: DataFrame, bench_mod: int = DECON_BENCH_MOD):
    """The static benchmark frame of the batch operator's
    `_decon_sides`.  PERSISTED: Structured Streaming re-evaluates the
    static side's plan every trigger, so without the persist each
    micro-batch would re-scan the corpus and recompute the md5 sign
    buckets + norms for a frame that is constant by construction."""
    return corpus.filter(F.col("vec_id") % bench_mod == 0).select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    ).persist()


def decontam_flag_stream(
    stream_vecs: DataFrame,
    bench: DataFrame,
    threshold: float = DECON_THRESHOLD,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """(streaming vec_id, embedding) × static bench → running flagged
    set with per-key (n_bench_hits, max_score), append per batch."""
    train = stream_vecs.filter(
        F.col("vec_id") % bench_mod != 0
    ).select(
        F.col("vec_id").alias("t_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    pairs = (
        train.join(F.broadcast(bench), "bucket")
        .select("t_id", "b_id", _pair_score().alias("score"))
        .filter(F.col("score") >= threshold)
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (t_id,) = key
        if state.exists:
            b_ids, scores, seq = state.get
            seen = dict(zip((int(b) for b in b_ids), scores))
        else:
            seen, seq = {}, 0
        for chunk in pdfs:
            for b, s in zip(chunk["b_id"], chunk["score"]):
                seen.setdefault(int(b), float(s))
        # one bump per fn invocation (= per key per micro-batch), NOT
        # per pandas chunk: Spark may hand the iterator several chunks,
        # and a per-chunk bump would make seq depend on chunking — a
        # replay nondeterminism (round-9 ADVICE).  seq is therefore a
        # true batch counter for the key.
        seq += 1
        items = sorted(seen.items())
        state.update(
            ([b for b, _ in items], [s for _, s in items], seq)
        )
        yield pd.DataFrame(
            [(t_id, seq, len(items), max(s for _, s in items))],
            columns=["vec_id", "seq", "n_bench_hits", "max_score"],
        )

    return pairs.groupBy(F.col("t_id")).applyInPandasWithState(
        fn,
        DECON_OUTPUT_SCHEMA,
        DECON_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

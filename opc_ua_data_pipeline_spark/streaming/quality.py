"""Streaming trained-quality scoring — the online twin of
operators/curation.trained_score_col under FROZEN weights (round-9
verdict item 7).

The quality gate IS a stream in production: documents arrive from the
crawl, the classifier was trained offline on a reference corpus, and
each arrival needs its score (and keep/drop decision) before it can
enter the training mix.  Under frozen weights the score is a
STATELESS narrow projection — the same five-feature linear form +
sigmoid the training loop fit, embedded in the plan as literals (the
frozen-model pattern of streaming/annindex.py: the driver holds only
the 5 weights, the sanctioned bounded collect of a MODEL) — so the
streaming stage composes with any source/sink, needs no state store,
and inherits exactly-once from the sink checkpoint.

Batch ≡ stream (same scores under any micro-batching, same gate
decisions) is pinned by tests/test_streaming_quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.curation import (
    CLF_TRAIN_ITERS,
    CLF_TRAIN_LR,
    _clf_train_loop,
    trained_score_col,
)

#: Default serving gate: keep documents the trained model scores at or
#: above the midpoint — the threshold a budget-less online filter uses
#: (budgeted trims stay a batch/windowed concern).
QUALITY_GATE = 0.5


def frozen_classifier_weights(
    ref_docs: DataFrame,
    lr: float = CLF_TRAIN_LR,
    n_iter: int = CLF_TRAIN_ITERS,
) -> list[float]:
    """Train the quality classifier on the offline reference corpus
    and hand back the final weights — 5 doubles, the bounded model
    collect the streaming projection embeds as literals."""
    _, w = _clf_train_loop(ref_docs, lr, n_iter)
    return w


def quality_score_stream(
    stream_docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
) -> DataFrame:
    """(streaming doc_id, text, ...) → + quality_score under frozen
    weights.  Stateless: one whole-stage-codegen projection, identical
    arithmetic to the batch serving column."""
    return stream_docs.withColumn(
        "quality_score", trained_score_col(weights, text_col)
    )


def quality_gate_stream(
    stream_docs: DataFrame,
    weights: list[float],
    gate: float = QUALITY_GATE,
    text_col: str = "text",
) -> DataFrame:
    """The online keep/drop decision: score + boolean ``keep``.
    Emits every document with its verdict (rather than silently
    filtering) so downstream sinks can route kept/dropped docs —
    drop-side retention is an audit requirement for curation
    pipelines.  NULL scores (token-less docs) are never kept:
    COALESCE(false) per the boolean-NULL contract."""
    scored = quality_score_stream(stream_docs, weights, text_col)
    return scored.withColumn(
        "keep",
        F.coalesce(F.col("quality_score") >= F.lit(gate), F.lit(False)),
    )

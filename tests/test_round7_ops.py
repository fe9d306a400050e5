"""Round-7 operator semantics: dup_span_stats, classifier_auc,
quantile_normalize_scores, metric_operator_chi2."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.curation import (
    classifier_auc,
    quantile_normalize_scores,
)
from opc_ua_data_pipeline_spark.operators.dedup import dup_span_stats
from opc_ua_data_pipeline_spark.operators.dq import metric_operator_chi2


def _docs(spark, rows):
    """rows: (doc_id, text, lang, source)"""
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=l, source=s) for i, t, l, s in rows],
        "doc_id long, text string, lang string, source string",
    )


# ---------------------------------------------------------------------------
# dup_span_stats
# ---------------------------------------------------------------------------


def test_dup_span_counts_cross_doc_and_within_doc(spark):
    shared = "a b c d e f g h"  # exactly one 8-token span
    docs = _docs(
        spark,
        [
            (1, shared, "en", "s"),            # span shared with doc 2
            (2, shared + " tail", "en", "s"),  # 2 spans, 1 shared
            (3, "solo text under width", "en", "s"),  # < 8 tokens
            (4, " ".join(["x"] * 16), "en", "s"),  # self-repeating spans
        ],
    )
    out = {r.doc_id: r for r in dup_span_stats(docs).collect()}
    assert (out[1].n_spans, out[1].n_dup_spans) == (1, 1)
    # doc 2: spans at offsets 1 ('a..h', dup) and 2 ('b..tail', unique)
    assert (out[2].n_spans, out[2].n_dup_spans) == (2, 1)
    assert out[2].dup_ratio == 0.5
    assert (out[3].n_spans, out[3].n_dup_spans) == (0, 0)
    assert out[3].dup_ratio is None
    # doc 4: all 9 spans are the same 'x x ... x' -> all duplicated
    assert (out[4].n_spans, out[4].n_dup_spans) == (9, 9)


# ---------------------------------------------------------------------------
# classifier_auc
# ---------------------------------------------------------------------------


def test_auc_perfect_separation_and_ties(spark):
    # long, stopword-rich docs score high; make all 'en' docs long
    long_t = "the of and to in " * 10
    short_t = "zzz qqq"
    docs = _docs(
        spark,
        [(i, long_t, "en", "s") for i in range(5)]
        + [(i + 10, short_t, "de", "s") for i in range(5)],
    )
    r = classifier_auc(docs).collect()[0]
    assert (r.n_pos, r.n_neg) == (5, 5)
    assert r.auc == 1.0

    # identical texts -> one tied score group -> mid-rank AUC is 1/2
    tied = _docs(
        spark,
        [(i, long_t, "en" if i % 2 == 0 else "de", "s") for i in range(10)],
    )
    r = classifier_auc(tied).collect()[0]
    assert r.auc == 0.5


# ---------------------------------------------------------------------------
# quantile_normalize_scores
# ---------------------------------------------------------------------------


def test_quantile_normalize_single_source_is_identity(spark):
    texts = [
        ("the of and to in " * (i + 1)).strip() for i in range(8)
    ]
    docs = _docs(spark, [(i, t, "en", "only") for i, t in enumerate(texts)])
    out = quantile_normalize_scores(docs).collect()
    # one source: per-source quantile == global quantile -> identity
    for r in out:
        assert r.norm_score == r.quality_score, r


def test_quantile_normalize_preserves_order_and_maps_to_global(spark):
    texts_a = [("the of and to in " * (i + 1)).strip() for i in range(6)]
    texts_b = [("zzz " * (i + 2)).strip() for i in range(4)]
    docs = _docs(
        spark,
        [(i, t, "en", "a") for i, t in enumerate(texts_a)]
        + [(100 + i, t, "en", "b") for i, t in enumerate(texts_b)],
    )
    rows = quantile_normalize_scores(docs).collect()
    all_scores = {r.quality_score for r in rows}
    for r in rows:
        assert r.norm_score in all_scores  # maps onto REAL global values
    for src in ("a", "b"):
        sub = sorted(
            (r for r in rows if r.source == src),
            key=lambda r: (r.quality_score, r.doc_id),
        )
        norms = [r.norm_score for r in sub]
        assert norms == sorted(norms)  # rank order preserved per source
    # per-source extremes hit the global extremes
    glob_sorted = sorted(all_scores)
    for src in ("a", "b"):
        sub = [r for r in rows if r.source == src]
        assert min(r.norm_score for r in sub) == glob_sorted[0]
        assert max(r.norm_score for r in sub) == glob_sorted[-1]


# ---------------------------------------------------------------------------
# metric_operator_chi2
# ---------------------------------------------------------------------------


def _tel(spark, rows):
    """rows: (metric, operator) pairs"""
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(
                time=t0 + dt.timedelta(seconds=i),
                metric=m,
                value_num=1.0,
                value_str=None,
                operator=o,
                event_id=i,
            )
            for i, (m, o) in enumerate(rows)
        ],
        "time timestamp, metric string, value_num double,"
        " value_str string, operator string, event_id long",
    )


def test_chi2_independent_grid_is_zero(spark):
    # perfectly independent uniform grid: o == e everywhere
    rows = [
        (m, o)
        for m in ("m1", "m2", "m3")
        for o in ("A", "B")
        for _ in range(4)
    ]
    r = metric_operator_chi2(_tel(spark, rows)).collect()[0]
    assert (r.n_cells, r.dof) == (6, 2)
    assert r.chi2 == 0.0 and r.cramers_v == 0.0


def test_chi2_diagonal_table_saturates(spark):
    # perfect dependence: k x k diagonal -> chi2 = n*(k-1), V = 1
    rows = [(f"m{i}", f"o{i}") for i in range(3) for _ in range(5)]
    r = metric_operator_chi2(_tel(spark, rows)).collect()[0]
    assert r.n_cells == 9 and r.dof == 4
    assert r.chi2 == pytest.approx(15 * 2, abs=1e-6)
    assert r.cramers_v == pytest.approx(1.0, abs=1e-9)

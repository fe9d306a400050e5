"""Sorted-neighborhood blocking: near-identical docs sort adjacent and
are caught with high Jaccard; candidate count is exactly n*w minus the
tail truncation; the two-pass rank is partitioning-invariant."""

from __future__ import annotations

from opc_ua_data_pipeline_spark.operators.dedup import (
    SN_WINDOW,
    sorted_neighborhood_pairs,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_edited_twin_is_caught_with_high_jaccard(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    texts = [
        base + "alpha",
        base + "omega",          # same 24-char prefix -> adjacent
        "completely different zebra text here",
        "unrelated words about mountains and rivers",
    ]
    out = sorted_neighborhood_pairs(_docs(spark, texts)).collect()
    twin = [
        r for r in out
        if {r["doc_a"], r["doc_b"]} == {0, 1}
    ]
    assert twin and twin[0]["same_key"] and twin[0]["jaccard"] >= 0.8
    strangers = [
        r for r in out
        if {r["doc_a"], r["doc_b"]} == {2, 3}
    ]
    for r in strangers:
        assert r["jaccard"] < 0.2


def test_candidate_count_is_exactly_n_w_minus_tail(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    out = sorted_neighborhood_pairs(docs)
    expect = n * SN_WINDOW - SN_WINDOW * (SN_WINDOW + 1) // 2
    assert out.count() == expect


def test_rank_is_partitioning_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = sorted(
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in sorted_neighborhood_pairs(docs).collect()
    )
    b = sorted(
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in sorted_neighborhood_pairs(docs.repartition(13)).collect()
    )
    assert a == b

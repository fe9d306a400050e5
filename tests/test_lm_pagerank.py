"""Property tests for the bigram LM scorer and near-dup PageRank
(oracle parity runs in tests/test_oracle_parity.py; these pin the
semantics the oracle can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.graph import pagerank
from opc_ua_data_pipeline_spark.operators.text import (
    _bigrams,
    bigram_logprob_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        list(enumerate(rows)), "doc_id long, text string"
    )


def test_bigram_extraction(spark):
    df = _docs(spark, ["a b c", "a", "", "x  y"])
    got = {
        r.doc_id: r.bg
        for r in df.select("doc_id", _bigrams().alias("bg")).collect()
    }
    assert got[0] == ["a b", "b c"]
    assert got[1] == [] and got[2] == []
    assert got[3] == ["x y"]  # tokenizer drops empty tokens


def test_bigram_lm_prefers_frequent_patterns(spark):
    # "a b" appears 9x in the corpus, "a z" once: the doc built from
    # the frequent bigram must out-score the doc with the rare one.
    corpus = _docs(spark, ["a b a b a b a b", "a b a b a b a b a b", "a z"])
    out = {r.doc_id: r for r in bigram_logprob_scores(corpus).collect()}
    assert out[0].mean_bigram_logprob > out[2].mean_bigram_logprob
    # short docs (<2 tokens) drop out entirely
    out2 = bigram_logprob_scores(_docs(spark, ["solo", "a b"])).collect()
    assert {r.doc_id for r in out2} == {1}


def test_pagerank_star_graph(spark):
    # star: 0-1, 0-2, 0-3 — the hub must dominate, leaves tie exactly
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long"
    )
    pr = {r.doc_id: r.pagerank for r in pagerank(edges).collect()}
    assert set(pr) == {0, 1, 2, 3}
    assert pr[0] > pr[1]
    assert pr[1] == pr[2] == pr[3]
    # total mass stays ~1 (per-iteration 12-dp rounding wiggle only)
    assert abs(sum(pr.values()) - 1.0) < 1e-6


def test_pagerank_symmetric_pair_uniform(spark):
    # a single pair is a 2-node regular graph: PR stays uniform
    edges = spark.createDataFrame([(7, 9)], "doc_a long, doc_b long")
    pr = {r.doc_id: r.pagerank for r in pagerank(edges).collect()}
    assert pr[7] == pr[9]
    assert abs(pr[7] - 0.5) < 1e-9


def test_pagerank_no_driver_data_loop(spark):
    # the iteration count is fixed; ensure the implementation keeps
    # data distributed (no collect) by checking it composes lazily up
    # to the checkpoints and returns the node frame
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "doc_a long, doc_b long"
    )
    out = pagerank(edges)
    assert out.columns == ["doc_id", "pagerank"]
    rows = out.collect()
    assert len(rows) == 4
    # higher-degree nodes (1,3 have deg 3) outrank deg-2 nodes (2,4)
    pr = {r.doc_id: r.pagerank for r in rows}
    assert min(pr[1], pr[3]) > max(pr[2], pr[4])


def test_dup_span_coverage_interval_union(spark):
    from opc_ua_data_pipeline_spark.operators.training import (
        dup_span_coverage,
    )

    # docs 0 and 1 share the passage "p q r s t u" (appears mid-doc);
    # doc 2 is unique text. n=4, min_docs=2.
    docs = spark.createDataFrame(
        [
            (0, "a1 b1 p q r s t u c1 d1"),
            (1, "x1 p q r s t u y1 z1"),
            (2, "m1 m2 m3 m4 m5 m6 m7 m8"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_span_coverage(docs).collect()}
    # shared passage has 6 tokens -> three 4-grams starting at each
    # position; doc 0 grams start at pos 3,4,5 -> union covers 6 tokens
    assert out[0].n_dup_grams == 3
    assert out[0].covered_tokens == 6
    assert abs(out[0].dup_coverage_ratio - 6 / 10) < 1e-12
    assert out[1].covered_tokens == 6
    assert out[2].n_dup_grams == 0 and out[2].covered_tokens == 0
    # disjoint duplicated spans must not merge: doc 3/4 share two
    # separated 4-grams
    docs2 = spark.createDataFrame(
        [
            (3, "s1 s2 s3 s4 g1 g2 g3 s1 s2 s3 s4"),
            (4, "s1 s2 s3 s4 h1 h2 h3 s1 s2 s3 s4"),
        ],
        "doc_id long, text string",
    )
    out2 = {r.doc_id: r for r in dup_span_coverage(docs2).collect()}
    # each doc: grams at pos 1 and pos 8 -> 4 + 4 = 8 covered tokens
    assert out2[3].covered_tokens == 8
    assert out2[3].n_dup_grams == 2


def test_q17_and_transitions(spark):
    from opc_ua_data_pipeline_spark.operators.relational import (
        event_transition_matrix,
        small_quantity_revenue,
    )
    from opc_ua_data_pipeline_spark.plans import formatted_plan
    from opc_ua_data_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    q17 = small_quantity_revenue(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "part")
    )
    plan = formatted_plan(q17)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # brand filter reaches the part scan
    assert "Brand#1" in plan and "PushedFilters" in plan

    tm = event_transition_matrix(load_table(spark, sf, "events")).collect()
    by_prev = {}
    for r in tm:
        by_prev.setdefault(r.prev_event, []).append(r)
    for prev, rows in by_prev.items():
        assert abs(sum(r.p_transition for r in rows) - 1.0) < 1e-9
        assert sum(r.n_transitions for r in rows) == rows[0].row_total


def test_dup_span_scrub_removes_shared_passage_only(spark):
    from opc_ua_data_pipeline_spark.operators.training import (
        dup_span_scrub,
    )

    docs = spark.createDataFrame(
        [
            (0, "a1 b1 p q r s t u c1 d1"),
            (1, "x1 p q r s t u y1 z1"),
            (2, "m1 m2 m3 m4 m5 m6 m7 m8"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_span_scrub(docs).collect()}
    # the shared 6-token passage disappears from BOTH carriers; the
    # surrounding unique prose survives in order
    assert out[0].clean_text == "a1 b1 c1 d1"
    assert out[0].kept_tokens == 4 and out[0].n_tokens == 10
    assert out[1].clean_text == "x1 y1 z1"
    # unique doc is untouched
    assert out[2].clean_text == "m1 m2 m3 m4 m5 m6 m7 m8"
    assert out[2].kept_tokens == 8


def test_dup_span_scrub_fully_duplicated_doc_empties(spark):
    from opc_ua_data_pipeline_spark.operators.training import (
        dup_span_scrub,
    )

    docs = spark.createDataFrame(
        [(0, "p q r s"), (1, "p q r s")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_span_scrub(docs).collect()}
    assert out[0].clean_text == "" and out[0].kept_tokens == 0
    assert out[1].clean_text == "" and out[1].kept_tokens == 0

"""Semantic + plan tests for operators/retrieval.py and the
sequential-Poisson weighted sampler (operators/sampling.py).

Oracle parity for all five contract queries is covered by
tests/test_oracle_parity.py (they are registered in
``__spark_entry__``); here we pin the properties the oracles can't
express: chunk reconstruction/overlap invariants, the CMS
overestimate guarantee, BM25 monotonicity, RRF fusion arithmetic,
weighted-sampling bias, and the physical-plan shapes that make the
operators scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.retrieval import (
    BM25_QUERY_TERMS,
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    bm25_topk,
    chunk_documents,
    heavy_hitters_cms,
    hybrid_search_rrf,
)
from opc_ua_data_pipeline_spark.operators.sampling import weighted_sample_topk
from opc_ua_data_pipeline_spark.plans import assert_plan, formatted_plan
from opc_ua_data_pipeline_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(rows)],
        "doc_id long, text string, source string",
    )


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_chunk_invariants(spark):
    texts = [
        "",  # empty -> still one (empty) chunk
        "x" * 10,  # shorter than one chunk
        "a" * CHUNK_SIZE,  # exactly one chunk
        "b" * (CHUNK_SIZE + 1),  # just past one chunk
        "".join(chr(ord("a") + i % 26) for i in range(997)),  # several
    ]
    out = chunk_documents(_docs(spark, texts)).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(texts):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        assert chunks[0].chunk_start == 1
        assert all(len(c.chunk_text) <= CHUNK_SIZE for c in chunks)
        # consecutive chunks overlap by exactly CHUNK_OVERLAP chars
        for a, b in zip(chunks, chunks[1:]):
            assert b.chunk_start - a.chunk_start == CHUNK_SIZE - CHUNK_OVERLAP
            assert a.chunk_text[-CHUNK_OVERLAP:] == b.chunk_text[:CHUNK_OVERLAP]
        # chunks reconstruct the document exactly
        rebuilt = chunks[0].chunk_text + "".join(
            c.chunk_text[CHUNK_OVERLAP:] for c in chunks[1:]
        )
        assert rebuilt == text
        # no chunk is a pure suffix of its predecessor (start rule)
        if len(text) > CHUNK_SIZE:
            assert chunks[-1].chunk_start <= max(1, len(text) - CHUNK_OVERLAP)


def test_chunker_plan_is_narrow(spark):
    plan = formatted_plan(chunk_documents(load_table(spark, SF, "documents")))
    assert "Exchange" not in plan  # generator projection, no shuffle
    assert "Generate" in plan


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_matches_only_and_monotone(spark):
    docs = _docs(
        spark,
        [
            "spark hash merge",  # all three terms
            "spark spark spark",  # heavy in one term
            "spark other words here",  # one term, longer
            "nothing relevant at all",  # no terms -> excluded
            "spark other",  # one term, shorter doc
        ],
    )
    out = {r.doc_id: r for r in bm25_topk(docs).collect()}
    assert 3 not in out  # zero-match doc never ranked
    # all-terms doc beats single-term docs
    assert out[0].rank == 1
    # same tf, shorter doc scores higher (length normalization)
    assert out[4].score > out[2].score


def test_bm25_plan_topk_heap(spark):
    df = bm25_topk(load_table(spark, SF, "documents"))
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    # corpus stats enter via broadcast, not a shuffled join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_overestimates_never_under(spark):
    docs = load_table(spark, SF, "documents")
    rows = heavy_hitters_cms(docs).collect()
    assert len(rows) == 20
    assert all(r.cms_estimate >= r.exact_cnt for r in rows)
    # ranks are 1..20 ordered by exact count desc
    by_rank = sorted(rows, key=lambda r: r.rank)
    counts = [r.exact_cnt for r in by_rank]
    assert counts == sorted(counts, reverse=True)


def test_cms_small_vocab_exact(spark):
    # with <= 64 distinct terms collisions are possible but estimates
    # still bound; a single-term corpus must be exact
    docs = _docs(spark, ["only only only", "only"])
    rows = heavy_hitters_cms(docs).collect()
    assert len(rows) == 1
    assert rows[0].exact_cnt == 4 and rows[0].cms_estimate == 4


# ---------------------------------------------------------------------------
# hybrid RRF
# ---------------------------------------------------------------------------


def test_rrf_fusion_arithmetic(spark):
    dense = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "q_id long, c_id long, rank int"
    )
    sparse = spark.createDataFrame(
        [(11, 1), (12, 2)], "doc_id long, rank int"
    )
    out = {r.doc_id: r for r in hybrid_search_rrf(dense, sparse).collect()}
    assert set(out) == {10, 11, 12}
    # doc 11 appears in both rankings -> highest fused score
    assert out[11].fused_rank == 1
    assert abs(out[11].rrf_score - (1 / 62 + 1 / 61)) < 1e-9
    assert out[10].dense_rank == 1 and out[10].sparse_rank is None


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_bias_and_plan(spark):
    docs = load_table(spark, SF, "documents")
    sample = weighted_sample_topk(docs, "n_chars", "doc_id", k=100)
    plan = formatted_plan(sample)
    assert "TakeOrderedAndProject" in plan
    rows = sample.collect()
    assert len(rows) == 100
    assert [r.sample_rank for r in sorted(rows, key=lambda r: r.priority)] == list(
        range(1, 101)
    )
    # inclusion is biased toward heavy rows: the sampled mean weight
    # must exceed the corpus mean (sf0.01 corpus, deterministic)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r.weight for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_weighted_sample_deterministic_under_repartition(spark):
    docs = load_table(spark, SF, "documents")
    a = {r.doc_id for r in weighted_sample_topk(docs, "n_chars", "doc_id").collect()}
    b = {
        r.doc_id
        for r in weighted_sample_topk(
            docs.repartition(7), "n_chars", "doc_id"
        ).collect()
    }
    assert a == b


def test_retrieval_no_python_udfs(spark):
    for build in (
        lambda: chunk_documents(load_table(spark, SF, "documents")),
        lambda: bm25_topk(load_table(spark, SF, "documents")),
        lambda: heavy_hitters_cms(load_table(spark, SF, "documents")),
    ):
        plan = formatted_plan(build())
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

"""Semantic tests for the round-3 curation operators
(operators/curation.py) on synthetic fixtures — the driver corpus is
single-line with no duplicate texts, so line_dedup's interesting
paths (multi-line docs, corpus-wide boilerplate, all-dup documents)
are pinned here.
"""

from __future__ import annotations

import math

import pytest

from opc_ua_data_pipeline_spark.operators.curation import (
    CLF_THRESHOLD,
    LINE_DUP_THRESHOLD,
    MIN_COVERAGE,
    line_dedup,
    quality_classifier,
    source_budget_trim,
    vocab_coverage,
)

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"alpha one\n{boiler}\nalpha two", "en", "s", 1),
        (2, f"{boiler}\nbeta one", "en", "s", 1),
        (3, "gamma only", "en", "s", 1),
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, rows)).collect()
    }
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == "alpha one\nalpha two"
    assert out[2]["clean_text"] == "beta one"
    assert out[3]["clean_text"] == "gamma only" and out[3]["n_kept"] == 1


def test_line_dedup_all_dup_doc_becomes_empty(spark):
    rows = [
        (1, "same line", "en", "s", 1),
        (2, "same line", "en", "s", 1),
    ]
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark, rows)).collect()}
    for d in (1, 2):
        assert out[d]["n_lines"] == 1 and out[d]["n_kept"] == 0
        assert out[d]["clean_text"] == ""


def test_line_dedup_trims_and_skips_blank_lines(spark):
    rows = [(1, "  a  \n\n   \nb", "en", "s", 1)]
    row = line_dedup(_docs(spark, rows)).collect()[0]
    assert row["n_lines"] == 2  # blanks dropped before counting
    assert row["clean_text"] == "a\nb"


def test_line_dedup_threshold_is_corpus_wide(spark):
    # two occurrences across DIFFERENT docs trip the default
    # threshold exactly like two in one doc
    assert LINE_DUP_THRESHOLD == 2
    rows = [
        (1, "x\ny", "en", "s", 1),
        (2, "x\nz", "en", "s", 1),
    ]
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["clean_text"] == "y"
    assert out[2]["clean_text"] == "z"


# ---------------------------------------------------------------------------
# quality_classifier
# ---------------------------------------------------------------------------


def test_quality_classifier_matches_reference_formula(spark):
    text = "the quick brown fox jumps over the lazy dog"
    rows = [(7, text, "en", "s", len(text))]
    r = quality_classifier(_docs(spark, rows)).collect()[0]
    toks = text.split()
    n = len(toks)
    stop = sum(1 for t in toks if t in {"the", "a", "of", "and", "to"})
    ttr = len(set(toks)) / n
    mean_len = sum(len(t) for t in toks) / n
    z = -3.0 + 0.6 * math.log(1.0 + n) + 2.5 * (stop / n) + 1.5 * ttr + 0.1 * mean_len
    score = 1.0 / (1.0 + math.exp(-z))
    assert r["n_tokens"] == n
    assert abs(r["quality_score"] - score) < 1e-9
    assert r["keep"] == (round(score, 9) >= CLF_THRESHOLD)


def test_quality_classifier_monotone_in_stopword_ratio(spark):
    # more stopwords (same token count) -> higher score
    rows = [
        (1, "the of and to a the of and", "en", "s", 1),
        (2, "zebra quark lattice fjord mingle oxbow pylon dune", "en", "s", 1),
    ]
    out = {
        r["doc_id"]: r["quality_score"]
        for r in quality_classifier(_docs(spark, rows)).collect()
    }
    assert out[1] > out[2]


# ---------------------------------------------------------------------------
# source_budget_trim
# ---------------------------------------------------------------------------


def test_source_budget_trim_greedy_per_source(spark):
    # source A: three 1500-token docs -> only two fit the 3000 budget,
    # and the two kept are the highest-scoring ones
    mk = lambda i, stop_heavy: (
        i,
        " ".join((["the", "of", "and"] if stop_heavy else ["zeb", "qrk", "ltc"]) * 500),
        "en",
        "A",
        1,
    )
    rows = [mk(1, True), mk(2, True), mk(3, False), (4, "solo doc here", "en", "B", 1)]
    out = source_budget_trim(_docs(spark, rows))
    kept = {r["doc_id"]: r for r in out.collect()}
    assert set(kept) == {1, 2, 4}  # doc 3 (lowest score) trimmed
    assert kept[2]["cum_tokens"] == 3000
    assert kept[4]["cum_tokens"] == 3


def test_source_budget_trim_cum_never_exceeds_budget(spark, tmp_path):
    from opc_ua_data_pipeline_spark.operators.curation import (
        SOURCE_TOKEN_BUDGET,
        q_source_budget_trim,
    )

    out = q_source_budget_trim(spark, "/root/testdata/sf0.001")
    mx = out.groupBy("source").agg({"cum_tokens": "max"}).collect()
    assert all(r["max(cum_tokens)"] <= SOURCE_TOKEN_BUDGET for r in mx)


# ---------------------------------------------------------------------------
# pq_adc_topk
# ---------------------------------------------------------------------------


def test_pq_adc_recalls_exact_l2_neighbors(spark):
    """ADC must rank true L2 neighbors far above chance.  The fixture
    embeddings are essentially isotropic noise (no low-dimensional
    cluster structure for 4x16 codebooks to exploit), so absolute
    recall is intrinsically low — measured ~0.08 vs a chance rate of
    10/499 ~ 0.02, i.e. 4x better than random.  The gate asserts the
    better-than-chance margin, not a real-data recall figure; exact
    ADC values are pinned by the DuckDB oracle separately."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.clustering import (
        PQ_N_QUERIES,
        pq_adc_topk,
    )
    from opc_ua_data_pipeline_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < PQ_N_QUERIES)
    adc = {
        (r["q_id"], r["c_id"])
        for r in pq_adc_topk(queries, emb).collect()
    }
    # exact squared-L2 top-10 per query
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
    )
    sq = F.zip_with(
        F.col("q_emb"),
        F.col("c_emb"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    dist = F.aggregate(sq, F.lit(0.0), lambda acc, d: acc + d)
    w = Window.partitionBy("q_id").orderBy(F.col("d").asc(), F.col("c_id"))
    exact = {
        (r["q_id"], r["c_id"])
        for r in c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", dist.alias("d"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .collect()
    }
    recall = len(adc & exact) / len(exact)
    chance = 10 / 499
    assert recall >= 2 * chance, (recall, chance)


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# bloom_contamination
# ---------------------------------------------------------------------------


def test_bloom_contamination_superset_of_exact_with_tiny_fp(spark):
    """Bloom flags must contain every exact hit (no false negatives);
    the false-positive overshoot should be within the documented
    (1-e^(-K*B/M))^K envelope — effectively a handful of grams at
    this corpus size."""
    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.training import (
        BENCHMARK_SOURCE,
        bloom_contamination,
        ngram_contamination,
    )
    from opc_ua_data_pipeline_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("source") != BENCHMARK_SOURCE)
    bench = docs.filter(F.col("source") == BENCHMARK_SOURCE)
    exact = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, bench).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in bloom_contamination(corpus, bench).collect()
    }
    assert set(exact) == set(bloom)
    total_fp = 0
    for d, e in exact.items():
        b = bloom[d]
        assert b["n_grams"] == e["n_grams"]
        assert b["n_flagged"] >= e["n_contaminated"], d  # no false negatives
        total_fp += b["n_flagged"] - e["n_contaminated"]
    total_grams = sum(e["n_grams"] for e in exact.values())
    # FP rate ~2e-6 at this benchmark size; allow enormous slack.
    assert total_fp <= max(5, total_grams // 1000)


def test_vocab_coverage_bounds_and_keep_flag(spark):
    rows = [(i, "common word salad", "en", "s", 1) for i in range(5)] + [
        (99, "xyzzy plugh abracadabra", "en", "s", 1)
    ]
    out = {r["doc_id"]: r for r in vocab_coverage(_docs(spark, rows)).collect()}
    for r in out.values():
        assert 0.0 <= r["coverage"] <= 1.0
        assert r["keep"] == (r["coverage"] >= MIN_COVERAGE)
    # the repeated trigram IS the top vocab -> full coverage
    assert out[0]["coverage"] == 1.0 and out[0]["keep"]
    # with only 6 distinct corpus terms, all fit in top-50 -> doc 99
    # is fully covered too (k bounds the vocab, not the corpus)
    assert out[99]["n_covered"] == 3


def test_cdc_chunks_resynchronize_after_edit(spark):
    """THE content-defined-chunking property: inserting characters
    near the head of a document disturbs only the chunks it touches —
    boundaries downstream re-synchronize, so most chunk digests
    survive the edit.  Fixed-stride chunking at the same granularity
    loses (almost) everything after the insertion point."""
    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.dedup import cdc_chunks

    base = "".join(chr(97 + (i * 7 + i * i // 5) % 26) for i in range(600))
    edited = base[:23] + "INSERTED" + base[23:]
    docs = spark.createDataFrame(
        [(1, "s", base), (2, "s", edited)],
        "doc_id long, source string, text string",
    )
    ch = cdc_chunks(docs).select("doc_id", F.md5("chunk").alias("d"))
    a = {r["d"] for r in ch.filter("doc_id = 1").collect()}
    b = {r["d"] for r in ch.filter("doc_id = 2").collect()}
    cdc_shared = len(a & b) / len(a)

    stride = 32
    fixed = {
        "base": {base[i : i + stride] for i in range(0, len(base), stride)},
        "edited": {
            edited[i : i + stride] for i in range(0, len(edited), stride)
        },
    }
    fixed_shared = len(fixed["base"] & fixed["edited"]) / len(fixed["base"])

    assert cdc_shared > 0.5, cdc_shared
    assert cdc_shared > fixed_shared + 0.3, (cdc_shared, fixed_shared)


def test_cdc_chunks_reassemble_exactly(spark):
    """Chunk edges partition the document: concatenating chunks in
    index order must reproduce the text byte-for-byte for every doc."""
    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.dedup import cdc_chunks
    from opc_ua_data_pipeline_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    re_joined = (
        cdc_chunks(docs)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk"))
                    ),
                    lambda s: s.chunk,
                ),
            ).alias("rebuilt")
        )
    )
    bad = (
        docs.join(re_joined, "doc_id")
        .filter(F.col("text") != F.col("rebuilt"))
        .count()
    )
    assert bad == 0


def test_cdc_neardup_finds_edited_twin_not_strangers(spark):
    """An edited copy shares most CDC chunks with its original
    (resync property) -> high-containment pair; an unrelated doc
    pairs with neither."""
    from opc_ua_data_pipeline_spark.operators.dedup import (
        cdc_neardup_pairs,
    )

    base = "".join(chr(97 + (i * 11 + i * i // 7) % 26) for i in range(800))
    edited = base[:37] + "EDITINSERT" + base[37:]
    other = "".join(chr(97 + (i * 5 + 3) % 26) for i in range(800))
    docs = spark.createDataFrame(
        [(1, "s", base), (2, "s", edited), (3, "s", other)],
        "doc_id long, source string, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in cdc_neardup_pairs(docs).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] > 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs

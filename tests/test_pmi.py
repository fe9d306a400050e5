"""PMI collocations: glued-pair phrases outrank chance-pair ones, the
min-count filter drops rare pairs, ranking is deterministic."""

from __future__ import annotations

from opc_ua_data_pipeline_spark.operators.text import (
    PMI_MIN_COUNT,
    pmi_collocations,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_glued_phrase_beats_chance_cooccurrence(spark):
    # "san francisco" always co-occurs; filler words pair randomly
    filler = "alpha beta gamma delta epsilon zeta"
    texts = [f"san francisco {filler}" for _ in range(8)] + [
        "beta alpha zeta gamma epsilon delta" for _ in range(8)
    ]
    out = pmi_collocations(_docs(spark, texts), min_count=5, k=10).collect()
    assert out, "no collocations survived min_count"
    top = out[0]
    assert (top["w1"], top["w2"]) == ("san", "francisco")
    # every returned PMI is positive here (all pairs over-co-occur
    # relative to a 16-doc corpus) and sorted descending
    pmis = [r["pmi"] for r in sorted(out, key=lambda r: r["rank"])]
    assert pmis == sorted(pmis, reverse=True)


def test_min_count_filters_rare_pairs(spark):
    texts = ["rare pair only once here"] + ["common words common words"] * 6
    out = pmi_collocations(_docs(spark, texts), min_count=PMI_MIN_COUNT, k=10).collect()
    assert all((r["w1"], r["w2"]) != ("rare", "pair") for r in out)


def test_runs_on_real_corpus_with_full_ranks(spark):
    out = pmi_collocations(load_table(spark, SF_DIR, "documents")).collect()
    assert len(out) == 50
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, 51)
    )
    assert all(r["n_bigram"] >= PMI_MIN_COUNT for r in out)

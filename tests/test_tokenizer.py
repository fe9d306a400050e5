"""BPE trainer semantics on handcrafted corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.tokenizer import (
    EOW,
    bpe_merges,
    bpe_segment,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )


def test_bpe_learns_the_dominant_pair_first(spark):
    """'aa' dominates: 8 occurrences of words containing the (a, a)
    pair vs anything else — the first merge must be (a, a)."""
    docs = _docs(spark, ["aab aab aab aab", "aac aac aac aac"])
    m = {r["iteration"]: r for r in bpe_merges(docs, k=10, n_merges=2).collect()}
    assert (m[1]["lhs"], m[1]["rhs"], m[1]["merged"]) == ("a", "a", "aa")
    assert m[1]["pair_count"] == 8


def test_bpe_tiebreak_is_lexicographic(spark):
    """Equal-count pairs: (b, </w>) vs (a, b) both appear twice in
    'ab ab'; argmax must pick the lexicographically smaller lhs."""
    docs = _docs(spark, ["ab ab"])
    m = bpe_merges(docs, k=10, n_merges=1).collect()[0]
    # pairs: (a,b)x2, (b,</w>)x2 -> '<' sorts before 'a' -> wait, lhs
    # 'a' < 'b', so (a, b) wins
    assert (m["lhs"], m["rhs"]) == ("a", "b")


def test_bpe_merge_is_greedy_left_nonoverlapping(spark):
    """'aaa': after merge (a, a), the sequence 'a a a </w>' becomes
    'aa a </w>' — the left pair merges, the survivor does not chain."""
    docs = _docs(spark, ["aaa aaa aaa"])
    merges = bpe_merges(docs, k=10, n_merges=1)
    seg = {
        r["word"]: r["segmented"]
        for r in bpe_segment(docs, merges).collect()
    }
    assert seg["aaa"] == f"aa a {EOW}"


def test_bpe_segment_reassembles_words(spark):
    """Dropping spaces from any segmentation must reproduce the word
    plus the end marker, whatever the learned merges were."""
    docs = _docs(
        spark,
        ["lower lower newest newest newest wider wider", "low low lowest"],
    )
    merges = bpe_merges(docs, k=16, n_merges=5)
    rows = bpe_segment(docs, merges).collect()
    assert rows
    for r in rows:
        assert r["segmented"].replace(" ", "") == r["word"] + EOW


def test_bpe_merges_monotone_counts_per_pairset(spark):
    """Pair counts are positive and the merge table has exactly
    n_merges distinct iterations."""
    docs = _docs(spark, ["the cat sat on the mat " * 5])
    out = bpe_merges(docs, k=12, n_merges=4).collect()
    assert len(out) == 4
    assert sorted(r["iteration"] for r in out) == [1, 2, 3, 4]
    assert all(r["pair_count"] > 0 for r in out)

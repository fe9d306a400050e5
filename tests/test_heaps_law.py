"""Heaps'-law fit: matches a straightforward Python recomputation on
the fixture corpus, and recovers the exact exponent on a synthetic
power-law corpus."""

from __future__ import annotations

import math

from opc_ua_data_pipeline_spark.operators.text import heaps_law_fit
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _fit(points):
    xs = [round(math.log(n), 9) for n, v in points]
    ys = [round(math.log(v), 9) for n, v in points]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return beta, (sy - beta * sx) / n


def test_heaps_matches_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents")
    row = heaps_law_fit(docs).collect()[0]
    # python recompute of the cumulative growth curve
    seen: set = set()
    pts = []
    n_tok = 0
    for r in docs.select("doc_id", "text").orderBy("doc_id").collect():
        ws = [w for w in r.text.split(" ") if w]
        n_tok += len(ws)
        seen.update(ws)
        if n_tok > 0 and seen:
            pts.append((n_tok, len(seen)))
    assert row.n_points == len(pts)
    beta, log_k = _fit(pts)
    assert abs(row.heaps_beta - beta) < 1e-6
    assert abs(row.heaps_log_k - log_k) < 1e-6
    # natural-ish fixture text: sublinear growth
    assert 0.0 < row.heaps_beta < 1.0


def test_heaps_exact_on_power_law_corpus(spark):
    """Synthetic corpus where V(N) = N^0.5 exactly at each doc
    boundary: doc i contributes 2i+1 tokens of which ONE is new, so
    after doc i, N = (i+1)^2 and V = i+1 -> beta = 0.5, log_k = 0."""
    rows = []
    for i in range(40):
        toks = [f"w{i}"] + [f"w{j}" for j in range(i)] * 2
        assert len(toks) == 2 * i + 1
        rows.append((i, " ".join(toks), "en", "s", len(" ".join(toks))))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    row = heaps_law_fit(docs).collect()[0]
    assert row.n_points == 40
    assert abs(row.heaps_beta - 0.5) < 1e-9
    assert abs(row.heaps_log_k) < 1e-9

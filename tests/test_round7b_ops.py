"""Round-7b operator semantics: winnowing fingerprints, multiset
containment, calibration/Brier, zipf_slope, event_burstiness."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.curation import (
    brier_decomposition,
    classifier_calibration,
    quality_classifier,
)
from opc_ua_data_pipeline_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_W,
    multiset_containment_pairs,
    winnow_fingerprint_stats,
    winnow_overlap_pairs,
    winnow_selected,
)
from opc_ua_data_pipeline_spark.operators.dq import event_burstiness
from opc_ua_data_pipeline_spark.operators.text import zipf_slope


def _docs(spark, rows):
    """rows: (doc_id, text, lang, source)"""
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=l, source=s) for i, t, l, s in rows],
        "doc_id long, text string, lang string, source string",
    )


def _utok(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # docs share a 24-token run with different surroundings; the
    # winnowing theorem guarantees any >= w+k-1-token match shares a
    # selected fingerprint.
    run = _utok("r", 24)
    docs = _docs(
        spark,
        [
            (1, _utok("a", 6) + " " + run, "en", "s"),
            (2, run + " " + _utok("b", 6), "en", "s"),
            (3, _utok("c", 30), "en", "s"),
        ],
    )
    sel = winnow_selected(docs).collect()
    fps = {d: {r.fp for r in sel if r.doc_id == d} for d in (1, 2, 3)}
    assert fps[1] & fps[2], "shared run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_density_and_short_docs(spark):
    docs = _docs(
        spark,
        [
            (1, _utok("u", 200), "en", "s"),
            (2, _utok("v", WINNOW_K - 1), "en", "s"),  # below k: no shingles
            (3, _utok("w", WINNOW_K + 1), "en", "s"),  # m=2 < w: one window
        ],
    )
    out = {r.doc_id: r for r in winnow_fingerprint_stats(docs).collect()}
    # unique tokens: expected density ~ 2/(w+1); allow generous slack
    d = out[1].n_selected / out[1].n_shingles
    assert 0.2 < d < 0.7
    assert (out[2].n_shingles, out[2].n_selected) == (0, 0)
    assert out[2].density is None
    assert out[3].n_shingles == 2 and out[3].n_selected == 1


def test_winnow_rightmost_tiebreak_on_repeats(spark):
    # all shingles identical: each window selects its rightmost
    # position; selected = one per window end in [w, m]
    n = 10
    m = n - WINNOW_K + 1  # 7 shingle positions
    docs = _docs(spark, [(1, " ".join(["x"] * n), "en", "s")])
    sel = winnow_selected(docs).collect()
    assert sorted(r.pos for r in sel) == list(range(WINNOW_W, m + 1))
    assert len({r.fp for r in sel}) == 1


def test_winnow_overlap_pairs_and_posting_cap(spark):
    run = _utok("r", 30)
    docs = _docs(
        spark,
        [
            (1, _utok("a", 5) + " " + run, "en", "s"),
            (2, run + " " + _utok("b", 5), "en", "s"),
            (3, _utok("c", 40), "en", "s"),
        ]
        # 20 identical docs: their fingerprint postings exceed the
        # stop cap (16) and must generate NO pairs
        + [(100 + i, _utok("z", 25), "en", "s") for i in range(20)],
    )
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_overlap_pairs(docs).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(a < 100 and b < 100 for a, b in pairs)


# ---------------------------------------------------------------------------
# multiset containment
# ---------------------------------------------------------------------------


def test_multiset_containment_directional(spark):
    inner = _utok("m", 12)
    docs = _docs(
        spark,
        [
            (1, inner, "en", "s"),
            # doc 2 swallows doc 1 twice plus 6 extra tokens
            (2, inner + " " + inner + " " + _utok("x", 6), "en", "s"),
            (3, _utok("q", 30), "en", "s"),
        ],
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in multiset_containment_pairs(docs).collect()
    }
    r = out[(1, 2)]
    # min(1, 2) per inner token -> shared mass = |doc1| = 12
    assert r.shared_mass == 12
    assert r.containment_a == 1.0
    assert r.containment_b == pytest.approx(12 / 30, abs=1e-9)
    assert all(3 not in k for k in out)


# ---------------------------------------------------------------------------
# calibration + Brier
# ---------------------------------------------------------------------------


def _mixed_docs(spark):
    texts = [
        ("the of and to in " * 8).strip(),  # high score
        "zz qq ww ee rr tt yy uu",  # low score
        ("is that it was for on " * 4).strip(),  # mid
    ]
    rows = []
    for i in range(30):
        t = texts[i % 3]
        lang = "en" if (i % 3 == 0 or i % 5 == 0) else "de"
        rows.append((i, t, lang, "s"))
    return _docs(spark, rows)


def test_calibration_bins_partition_the_corpus(spark):
    docs = _mixed_docs(spark)
    out = classifier_calibration(docs).collect()
    assert sum(r.n_docs for r in out) == 30
    scores = {
        r.doc_id: r.quality_score
        for r in quality_classifier(docs).collect()
    }
    import decimal

    for r in out:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.frac_pos <= 1.0
        # mean_score must lie inside the bin's score range
        members = [
            s
            for s in scores.values()
            if min(int(decimal.Decimal(str(s)) * 10), 9) == r.bin
        ]
        assert len(members) > 0
        assert min(members) - 1e-9 <= r.mean_score <= max(members) + 1e-9


def test_brier_decomposition_identity_and_closed_form(spark):
    # every doc with the same text has the same score, so scores are
    # constant within bins and Murphy's identity holds up to the
    # DECIMAL(18,9) collapses
    docs = _mixed_docs(spark)
    r = brier_decomposition(docs).collect()[0]
    assert r.n_docs == 30
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 1e-6
    # closed form from the collected scores/labels
    rows = quality_classifier(docs).collect()
    langs = {d.doc_id: d.lang for d in docs.collect()}
    brier = sum(
        (d.quality_score - (1 if langs[d.doc_id] == "en" else 0)) ** 2
        for d in rows
    ) / len(rows)
    assert r.brier == pytest.approx(brier, abs=1e-8)


# ---------------------------------------------------------------------------
# zipf_slope
# ---------------------------------------------------------------------------


def test_zipf_slope_closed_form(spark):
    # geometric frequencies 8/4/2/1 -> exact OLS slope on (ln rank, ln c)
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = _docs(spark, [(1, text, "en", "src1")])
    out = zipf_slope(docs).collect()[0]
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (8, 4, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out.n_terms == 4
    assert out.zipf_slope == pytest.approx(slope, abs=1e-6)


# ---------------------------------------------------------------------------
# event_burstiness
# ---------------------------------------------------------------------------


def test_fano_factor_closed_form(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, typ, minute, k):
        return Row(
            event_id=i,
            ts=t0 + dt.timedelta(minutes=minute, seconds=k),
            user_id=1,
            event_type=typ,
            value=1.0,
            props="{}",
        )

    rows, i = [], 0
    # type X: 2 events in each of 3 minutes -> var 0, fano 0
    for m in range(3):
        for k in range(2):
            rows.append(ev(i, "X", m, k))
            i += 1
    # type Y: counts [1, 3] -> mean 2, var_pop 1, fano 0.5
    rows.append(ev(i, "Y", 0, 0))
    i += 1
    for k in range(3):
        rows.append(ev(i, "Y", 1, k))
        i += 1
    events = spark.createDataFrame(rows)
    out = {r.event_type: r for r in event_burstiness(events).collect()}
    assert out["X"].n_buckets == 3 and out["X"].fano_factor == 0.0
    assert out["X"].mean_per_minute == 2.0
    assert out["Y"].n_buckets == 2 and out["Y"].fano_factor == 0.5


# ---------------------------------------------------------------------------
# kmeans_silhouette
# ---------------------------------------------------------------------------


def test_silhouette_well_separated_clusters(spark):
    from opc_ua_data_pipeline_spark.operators.clustering import (
        kmeans_silhouette,
    )

    # two tight, far-apart blobs in 2-D: mean silhouette ~ 1
    rows = []
    for i in range(8):
        base = [0.0, 0.0] if i % 2 == 0 else [100.0, 100.0]
        rows.append(
            Row(
                vec_id=i,
                embedding=[base[0] + (i % 4) * 0.1, base[1]],
                label=i % 2,
            )
        )
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = kmeans_silhouette(corpus, k=2, n_iter=2).collect()
    assert sum(r.n_vecs for r in out) == 8
    for r in out:
        assert r.mean_silhouette > 0.99


# ---------------------------------------------------------------------------
# k_anonymity_audit
# ---------------------------------------------------------------------------


def test_k_anonymity_class_histogram(spark):
    from opc_ua_data_pipeline_spark.operators.dq import (
        K_ANON,
        k_anonymity_audit,
    )

    rows = []
    cid = 0
    # one class of 6 (safe), two classes of 2 (at risk)
    for _ in range(6):
        rows.append(Row(c_custkey=cid, c_name="x", c_nationkey=1,
                        c_acctbal=500.0, c_mktsegment="A"))
        cid += 1
    for seg in ("B", "C"):
        for _ in range(2):
            rows.append(Row(c_custkey=cid, c_name="x", c_nationkey=2,
                            c_acctbal=1500.0, c_mktsegment=seg))
            cid += 1
    cust = spark.createDataFrame(rows)
    out = {r.class_size: r for r in k_anonymity_audit(cust).collect()}
    assert out[6].n_classes == 1 and out[6].n_rows == 6
    assert not out[6].at_risk
    assert out[2].n_classes == 2 and out[2].n_rows == 4
    assert out[2].at_risk and 2 < K_ANON


def test_k_anonymity_band_edges_exact(spark):
    from opc_ua_data_pipeline_spark.operators.dq import k_anonymity_audit

    # 999.99 and 1000.00 must land in different bands (decimal floor,
    # no float-edge flip)
    rows = [
        Row(c_custkey=1, c_name="x", c_nationkey=1, c_acctbal=999.99,
            c_mktsegment="A"),
        Row(c_custkey=2, c_name="x", c_nationkey=1, c_acctbal=1000.00,
            c_mktsegment="A"),
    ]
    out = k_anonymity_audit(spark.createDataFrame(rows)).collect()
    assert {r.class_size for r in out} == {1}
    assert sum(r.n_classes for r in out) == 2


# ---------------------------------------------------------------------------
# padding_waste_report
# ---------------------------------------------------------------------------


def test_padding_waste_sorted_beats_arrival(spark):
    from opc_ua_data_pipeline_spark.operators.training import (
        padding_waste_report,
    )

    # alternating short/long docs: arrival-order batches mix lengths
    # (waste), sorted batches are homogeneous (zero waste)
    rows = []
    for i in range(8):
        n = 2 if i % 2 == 0 else 10
        rows.append((i, _utok("t", n), "en", "s"))
    docs = _docs(spark, rows)
    out = {r.policy: r for r in padding_waste_report(docs, 4).collect()}
    assert out["by_doc_id"].n_batches == 2
    assert out["length_sorted"].n_batches == 2
    assert out["by_doc_id"].total_tokens == 48
    # arrival: both batches pad to 10 -> padded 80
    assert out["by_doc_id"].padded_tokens == 80
    assert out["by_doc_id"].waste_frac == pytest.approx(0.4)
    # sorted: batch of four 2s + batch of four 10s -> no padding
    assert out["length_sorted"].padded_tokens == 48
    assert out["length_sorted"].waste_frac == 0.0


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_bounds_and_totals(spark):
    from opc_ua_data_pipeline_spark.operators.tokenizer import (
        bpe_merges,
        bpe_segment,
        tokenizer_fertility,
    )

    docs = _docs(
        spark,
        [
            (1, "aa ab aa ab aa", "en", "s"),
            (2, "xyz xyz qrs", "de", "s"),
        ],
    )
    out = {r.lang: r for r in tokenizer_fertility(docs).collect()}
    assert out["en"].n_words == 5 and out["de"].n_words == 3
    # chars are pre-segmentation word lengths
    assert out["en"].n_chars == 10 and out["de"].n_chars == 9
    # fertility is tokens/word and consistent with the segment map
    seg = {
        r.word: len(r.segmented.split(" "))
        for r in bpe_segment(docs, bpe_merges(docs)).collect()
    }
    exp_en = (3 * seg["aa"] + 2 * seg["ab"]) / 5
    assert out["en"].fertility == pytest.approx(exp_en, abs=1e-9)
    assert out["en"].n_tokens == 3 * seg["aa"] + 2 * seg["ab"]


# ---------------------------------------------------------------------------
# hard_negative_pairs
# ---------------------------------------------------------------------------


def test_hard_negatives_label_and_margin(spark):
    from opc_ua_data_pipeline_spark.operators.similarity import (
        hard_negative_pairs,
    )

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=0),   # query
        Row(vec_id=1, embedding=[0.9, 0.1], label=0),   # positive
        Row(vec_id=2, embedding=[1.0, 0.01], label=1),  # HARD negative
        Row(vec_id=3, embedding=[0.0, 1.0], label=1),   # easy negative
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negative_pairs(
        emb.filter(F.col("vec_id") == 0), emb, k=5
    ).collect()
    by_c = {r.c_id: r for r in out}
    assert set(by_c) == {2, 3}  # only different-label vectors
    assert by_c[2].rank == 1 and by_c[2].hard is True
    assert by_c[3].hard is False
    assert all(r.pos_score == by_c[2].pos_score for r in out)

    # a query with NO same-label positive gets NULL pos_score (not a
    # -1.0 sentinel, which collides with the cosine minimum) and every
    # negative flagged hard
    lone = hard_negative_pairs(
        emb.filter(F.col("vec_id") == 0),
        emb.filter(F.col("vec_id") != 1),
        k=5,
    ).collect()
    assert lone and all(r.pos_score is None and r.hard is True for r in lone)


# ---------------------------------------------------------------------------
# query_likelihood_topk
# ---------------------------------------------------------------------------


def test_query_likelihood_closed_form(spark):
    import math as _m

    from opc_ua_data_pipeline_spark.operators.retrieval import (
        QL_MU,
        query_likelihood_topk,
    )

    docs = _docs(
        spark,
        [
            (1, "spark spark hash", "en", "s"),
            (2, "spark other words here", "en", "s"),
            (3, "nothing relevant at all", "en", "s"),
        ],
    )
    out = {r.doc_id: r for r in query_likelihood_topk(docs).collect()}
    assert 3 not in out  # no query term -> not ranked
    assert out[1].rank == 1  # doc 1 dominates on both matched terms
    # closed form for doc 1: tf spark=2, hash=1, merge=0; dl=3
    c_len = 3 + 4 + 4
    cf = {"spark": 3, "hash": 1, "merge": 0}
    # 'merge' is out-of-collection (cf = 0): it must contribute 0,
    # not ln(0)
    score = sum(
        _m.log(
            (tf + QL_MU * (cf[t] / c_len)) / (3 + QL_MU)
        )
        for t, tf in (("spark", 2.0), ("hash", 1.0))
    )
    assert out[1].score == pytest.approx(score, abs=1e-8)


# ---------------------------------------------------------------------------
# local clustering + assortativity
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(u=a, v=b) for a, b in pairs], "u long, v long"
    )


def test_local_clustering_closed_form(spark):
    from opc_ua_data_pipeline_spark.operators.graph import local_clustering

    # triangle 1-2-3 plus pendant 4 attached to 1
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4)])
    out = {r.node: r for r in local_clustering(e).collect()}
    assert out[1].degree == 3 and out[1].n_triangles == 1
    # node 1: 1 triangle / C(3,2)=3 wedges -> 2*1/(3*2) = 1/3
    assert out[1].clustering_coeff == pytest.approx(1 / 3, abs=1e-9)
    assert out[2].clustering_coeff == 1.0
    assert out[3].clustering_coeff == 1.0
    # degree-1 vertex: undefined
    assert out[4].n_triangles == 0 and out[4].clustering_coeff is None


def test_degree_assortativity_star_is_negative(spark):
    from opc_ua_data_pipeline_spark.operators.graph import (
        degree_assortativity,
    )

    # star K_{1,4}: perfectly disassortative, r = -1
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    r = degree_assortativity(e).collect()[0]
    assert r.n_edge_slots == 8
    assert r.assortativity == pytest.approx(-1.0, abs=1e-9)

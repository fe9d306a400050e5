"""Semantic unit tests for the round-6b operators (triangle census,
Misra-Gries heavy hitters, prefix-filter Jaccard join, Theil-Sen
trend, sliding histogram quantile) — crafted inputs with
hand-computable answers; oracle parity at sf0.01/sf0.1 is pinned by
checkq / local_correctness."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.dedup import (
    jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from opc_ua_data_pipeline_spark.operators.graph import triangle_stats
from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
    theil_sen_trend,
)
from opc_ua_data_pipeline_spark.operators.sketch import (
    heavy_hitter_bigrams,
    sliding_histogram_quantile,
)

T0 = dt.datetime(2024, 1, 1)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(u=a, v=b) for a, b in pairs], "u long, v long"
    )


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def _tel(spark, rows):
    """rows: (day_offset, second, metric, value)"""
    return spark.createDataFrame(
        [
            Row(
                time=T0 + dt.timedelta(days=d, seconds=s),
                metric=m,
                value_num=float(v),
                event_id=i,
            )
            for i, (d, s, m, v) in enumerate(rows)
        ],
        "time timestamp, metric string, value_num double, event_id long",
    )


# ---------------------------------------------------------------------------
# triangle_stats
# ---------------------------------------------------------------------------


def test_triangle_census_k4_minus_edge(spark):
    # K4 minus (1,4): triangles {1,2,3} and {2,3,4}; degrees 2,3,3,2
    g = _edges(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    r = triangle_stats(g).collect()[0]
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (4, 5, 2)
    assert r.n_wedges == 1 + 3 + 3 + 1
    assert abs(r.global_clustering - 6 / 8) < 1e-9


def test_triangle_census_wedge_free_graph_abstains(spark):
    r = triangle_stats(_edges(spark, [(1, 2), (3, 4)])).collect()[0]
    assert r.n_triangles == 0 and r.n_wedges == 0
    assert r.global_clustering is None


def test_triangle_census_counts_each_triangle_once_on_hub(spark):
    # star + rim: hub 0 to 1..5, rim cycle closes 5 triangles; the
    # degree-ordered orientation must not double count around the hub
    rim = [(i, i + 1) for i in range(1, 5)] + [(1, 5)]
    g = _edges(spark, [(0, i) for i in range(1, 6)] + rim)
    r = triangle_stats(g).collect()[0]
    assert r.n_triangles == 5


# ---------------------------------------------------------------------------
# heavy_hitter_bigrams (Misra-Gries)
# ---------------------------------------------------------------------------


def test_mg_heavy_hitters_match_brute_force_under_tiny_k(spark):
    # skewed stream: 'a b' dominates, long tail of one-offs; k far
    # smaller than the vocabulary so MG actually decrements
    texts = ["a b " * 50] * 4 + [
        " ".join(f"t{i}_{j}" for j in range(40)) for i in range(20)
    ]
    docs = _docs(spark, texts).repartition(4)
    out = {
        r.bigram: r.n_occurrences
        for r in heavy_hitter_bigrams(docs, phi=0.05, k=32).collect()
    }
    # brute force on the exploded bigram stream
    bgs = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(filter(split(text, ' '),"
                " t -> t <> '')) - 2), i ->"
                " concat(element_at(filter(split(text, ' '), t -> t <> ''),"
                " i + 1), ' ', element_at(filter(split(text, ' '),"
                " t -> t <> ''), i + 2)))"
            )
        ).alias("bg")
    )
    n = bgs.count()
    brute = {
        r.bg: r.cnt
        for r in bgs.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
        if r.cnt >= -(-0.05 * n // 1)  # ceil
    }
    assert out == brute
    assert "a b" in out  # the designed heavy hitter survived


def test_mg_degenerate_docs(spark):
    # round-6 advice: single-token docs crashed the transform(sequence)
    # bigram spelling (INVALID_ARRAY_INDEX_IN_ELEMENT_AT) and NULL
    # texts crashed the MG pass (AttributeError on .split) — both
    # input classes must flow through and contribute no bigrams,
    # matching the SQL counting side's domain.
    texts = ["solo", "", "a  b", "x y x y x y"]
    docs = _docs(spark, texts)
    docs = docs.union(
        spark.createDataFrame(
            [Row(doc_id=99, text=None)], "doc_id long, text string"
        )
    ).repartition(3)
    out = {
        r.bigram: r.n_occurrences
        for r in heavy_hitter_bigrams(docs, phi=0.2, k=16).collect()
    }
    # 'a  b' double space still yields 'a b' (empty tokens filtered
    # BEFORE pairing on both the Spark and sketch sides)
    assert out == {"x y": 3, "y x": 2}  # 4 total bigrams incl. 'a b'


def test_mg_no_false_negatives_across_partitions(spark):
    # the hitter is heavy globally but diluted in every partition
    texts = ["x y " * 5 + " ".join(f"n{i}_{j}" for j in range(10)) for i in range(16)]
    docs = _docs(spark, texts).repartition(8)
    out = heavy_hitter_bigrams(docs, phi=0.1, k=64).collect()
    assert any(r.bigram == "x y" for r in out)


# ---------------------------------------------------------------------------
# prefix_filter_jaccard_pairs == exact quadratic join
# ---------------------------------------------------------------------------


def test_prefix_filter_equals_quadratic(spark):
    base = "the quick brown fox jumps over the lazy dog".split()
    texts = [
        " ".join(base),
        " ".join(base[:-1] + ["cat"]),
        " ".join(base[:4] + ["zeta", "eta", "theta", "iota"]),
        "completely different words entirely here now",
        " ".join(base) + " extra",
        "zz",
    ]
    docs = _docs(spark, texts)
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in prefix_filter_jaccard_pairs(docs, 0.5).collect()
    }
    want = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in jaccard_pairs(docs, 0.5).collect()
    }
    assert got == want and len(want) >= 2


def test_prefix_filter_tiny_docs_alpha_clamp(spark):
    # single/two-token docs where required overlap α < k_prefix=2: the
    # shared-token requirement must clamp to α or identical one-token
    # docs would be lost (round-10 k-prefix scheme edge case)
    texts = ["solo", "solo", "pair twin", "pair twin", "pair other"]
    docs = _docs(spark, texts)
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in prefix_filter_jaccard_pairs(docs, 0.5).collect()
    }
    want = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in jaccard_pairs(docs, 0.5).collect()
    }
    assert got == want
    assert (0, 1, 1.0) in got  # the identical single-token pair


def test_prefix_filter_prunes_candidates(spark):
    # docs sharing ONLY the corpus-wide most frequent token must not
    # become candidates: rare-first ordering pushes it out of prefixes
    texts = [f"common u{i} v{i} w{i} x{i}" for i in range(10)]
    docs = _docs(spark, texts)
    assert prefix_filter_jaccard_pairs(docs, 0.5).count() == 0


# ---------------------------------------------------------------------------
# theil_sen_trend
# ---------------------------------------------------------------------------


def test_theil_sen_ignores_outlier_day(spark):
    # perfect +2/day trend, one catastrophic spike day; the Sen
    # median slope stays ~2 while OLS would be dragged far off
    rows = [(d, 0, "m", 2.0 * d) for d in range(11)]
    rows[5] = (5, 0, "m", 1e6)
    r = theil_sen_trend(_tel(spark, rows)).collect()[0]
    assert r.n_days == 11 and r.n_pairs == 55
    assert abs(r.sen_slope_per_day - 2.0) < 1e-6


def test_theil_sen_single_day_metric_absent(spark):
    out = theil_sen_trend(
        _tel(spark, [(0, 0, "solo", 1.0), (0, 60, "solo", 2.0)])
    ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# sliding_histogram_quantile
# ---------------------------------------------------------------------------


def test_histogram_quantile_hand_computed(spark):
    # day 0: values 0..190 step 10 -> buckets 0..19, one each;
    # rank ceil(.95*20)=19 -> bucket 18 -> lower bound 180
    rows = [(0, i, "m", 10.0 * i) for i in range(20)]
    # day 1: ten 5s -> window(day1) = 30 values, rank 29 -> bucket 18
    rows += [(1, i, "m", 5.0) for i in range(10)]
    out = {
        str(r.window_end): (r.n_window, r.q_bucket, r.q_value_lo)
        for r in sliding_histogram_quantile(_tel(spark, rows)).collect()
    }
    assert out["2024-01-01"] == (20, 18, 180.0)
    assert out["2024-01-02"] == (30, 18, 180.0)


def test_histogram_quantile_window_forgets(spark):
    # the spike day leaves the 7-day window: day 8's p95 is tail-free
    rows = [(0, i, "m", 400.0) for i in range(20)]
    rows += [(8, i, "m", 10.0) for i in range(20)]
    out = {
        str(r.window_end): r.q_value_lo
        for r in sliding_histogram_quantile(_tel(spark, rows)).collect()
    }
    assert out["2024-01-01"] == 400.0
    assert out["2024-01-09"] == 10.0


# ---------------------------------------------------------------------------
# score_decile_profile / conversion_latency_quantiles / metric_operator_mi
# ---------------------------------------------------------------------------


def test_score_deciles_partition_the_corpus(spark):
    from opc_ua_data_pipeline_spark.operators.curation import (
        score_decile_profile,
    )

    docs = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=" ".join(f"w{i}_{j}" for j in range(3 + i % 7)),
                source=f"src{i % 3}",
            )
            for i in range(40)
        ],
        "doc_id long, text string, source string",
    )
    rows = sorted(score_decile_profile(docs).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_docs for r in rows) == 40
    # deciles are score-descending: each decile's floor >= the next's cap
    for a, b in zip(rows, rows[1:]):
        assert a.min_score >= b.max_score


def test_conversion_latency_quantiles_hand_ranked(spark):
    from opc_ua_data_pipeline_spark.operators.journeys import (
        conversion_latency_quantiles,
    )

    rows = []
    for u in range(1, 11):  # user u converts in exactly u seconds
        rows.append((0, u, "signup", 1.0))
        rows.append((u, u, "purchase", 5.0))
    # noise: a purchase BEFORE signup must not count
    rows.append((0, 99, "purchase", 1.0))
    ev = _events_tbl(spark, rows)
    out = {r.quantile: (r.latency_us, r.n_users)
           for r in conversion_latency_quantiles(ev).collect()}
    # ranks ceil(q*10): p50 -> 5th (5s), p90 -> 9th, p95 -> 10th
    assert out[0.5] == (5_000_000, 10)
    assert out[0.9] == (9_000_000, 10)
    assert out[0.95] == (10_000_000, 10)


def _events_tbl(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=T0 + dt.timedelta(seconds=s),
                user_id=u,
                event_type=k,
                value=float(v),
                props=None,
            )
            for i, (s, u, k, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _mi_tel(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                time=T0 + dt.timedelta(seconds=i),
                metric=m,
                operator=o,
                value_num=1.0,
                event_id=i,
            )
            for i, (m, o) in enumerate(rows)
        ],
        "time timestamp, metric string, operator string, "
        "value_num double, event_id long",
    )


def test_mi_zero_when_independent(spark):
    from opc_ua_data_pipeline_spark.operators.dq import metric_operator_mi

    rows = [(m, o) for m in ("a", "b") for o in ("x", "y") for _ in range(5)]
    r = metric_operator_mi(_mi_tel(spark, rows)).collect()[0]
    assert r.n_cells == 4 and r.n_events == 20
    assert abs(r.mi_nats) < 1e-8


def test_mi_equals_ln_k_when_deterministic(spark):
    import math

    from opc_ua_data_pipeline_spark.operators.dq import metric_operator_mi

    rows = [("a", "x")] * 7 + [("b", "y")] * 7 + [("c", "z")] * 7
    r = metric_operator_mi(_mi_tel(spark, rows)).collect()[0]
    assert abs(r.mi_nats - math.log(3)) < 1e-6


# ---------------------------------------------------------------------------
# bmp_downscale (resize through the real codec)
# ---------------------------------------------------------------------------


def test_bmp_downscale_roundtrip_and_box_average(spark):
    from opc_ua_data_pipeline_spark.operators.multimodal import (
        as_bmp,
        bmp_downscale,
        decode_bmp_features,
    )

    docs = _docs(spark, ["abcdefghijkl" * 4, "zyxwvutsrqpo" * 4])
    small = bmp_downscale(as_bmp(docs))
    rows = {r.doc_id: r for r in small.collect()}
    assert all(r.width == 2 and r.height == 2 for r in rows.values())
    # the re-encoded payload is a REAL BMP: the production decoder
    # reads it back and agrees on every stat
    redecoded = decode_bmp_features(
        small.select("doc_id", "payload")
    ).collect()
    assert len(redecoded) == 2
    for r in redecoded:
        assert (r.width, r.height) == (2, 2)
        assert abs(r.px_mean - rows[r.doc_id].px_mean) < 1e-9
        assert r.top_left_b == rows[r.doc_id].top_left_b
    # constant image: box average of a constant IS the constant
    const = bmp_downscale(as_bmp(_docs(spark, ["a" * 48]))).collect()[0]
    assert const.px_mean == 97.0 and const.top_left_b == 97


# ---------------------------------------------------------------------------
# association_rules / link_prediction / seasonal_decompose / spearman /
# survival_curve
# ---------------------------------------------------------------------------


def _baskets(spark, orders):
    rows = []
    for okey, parts in orders:
        for i, p in enumerate(parts):
            rows.append(
                Row(l_orderkey=okey, l_partkey=p, l_linenumber=i)
            )
    return spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    )


def test_association_rules_hand_computed(spark):
    from opc_ua_data_pipeline_spark.operators.graph import association_rules

    # 4 baskets: {1,2} twice, {1,3}, {1}; pair (1,2) support 2
    li = _baskets(spark, [(10, [1, 2]), (11, [1, 2]), (12, [1, 3]), (13, [1])])
    out = {(r.antecedent, r.consequent): r for r in
           association_rules(li, min_support=2).collect()}
    assert set(out) == {(1, 2), (2, 1)}
    r12, r21 = out[(1, 2)], out[(2, 1)]
    assert r12.n_both == 2 and r12.support == 0.5
    assert abs(r12.confidence - 2 / 4) < 1e-12      # P(2|1) = 2/4
    assert abs(r21.confidence - 1.0) < 1e-12        # P(1|2) = 2/2
    assert abs(r12.lift - (2 * 4) / (4 * 2)) < 1e-12  # = 1.0


def test_link_prediction_scores_distance2_only(spark):
    from opc_ua_data_pipeline_spark.operators.graph import (
        link_prediction_topk,
    )

    # path graph 1-2-3 plus edge 3-4: candidates (1,3) share {2},
    # (2,4) share {3}, (1,4)? distance 3 -> absent; (1,2) adjacent
    g = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    out = {(r.x, r.y): r.jaccard for r in link_prediction_topk(g).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    # N(1)={2}, N(3)={2,4}: common 1, union 2 -> 0.5
    assert abs(out[(1, 3)] - 0.5) < 1e-12


def test_seasonal_decompose_recovers_weekly_pattern(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        seasonal_decompose,
    )

    # pure weekly signal, zero trend: value = bump on day_idx%7==0
    rows = []
    for d in range(28):
        v = 70.0 if (19723 + d) % 7 == 0 else 0.0  # 2024-01-01 = 19723
        rows.append((d, 0, "m", v))
    out = {str(r.day): r for r in
           seasonal_decompose(_tel(spark, rows)).collect()}
    mid = out["2024-01-10"]
    assert abs(mid.trend - 10.0) < 1e-9           # 70/7 per window
    assert abs(mid.seasonal - (0.0 - 10.0)) < 1e-9  # non-bump day
    assert abs(mid.residual) < 1e-9
    # edges abstain
    assert out["2024-01-01"].trend is None
    assert out["2024-01-01"].residual is None


def test_spearman_exact_monotone_and_antitone(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        spearman_correlation,
    )

    rows = []
    for d in range(10):
        rows.append((d, 0, "up", float(d)))
        rows.append((d, 1, "up2", float(d * d)))   # same order -> rho 1
        rows.append((d, 2, "down", float(-d)))     # reversed -> rho -1
    out = {(r.metric_a, r.metric_b): r.spearman_rho
           for r in spearman_correlation(_tel(spark, rows)).collect()}
    assert abs(out[("up", "up2")] - 1.0) < 1e-12
    assert abs(out[("down", "up")] + 1.0) < 1e-12
    assert abs(out[("down", "up2")] + 1.0) < 1e-12


def test_survival_curve_hand_computed(spark):
    from opc_ua_data_pipeline_spark.operators.journeys import survival_curve

    # 4 users: lifespans 0, 1, 1, 3 days
    rows = [(0, 1, "click", 1.0)]
    rows += [(0, 2, "click", 1.0), (1, 2, "click", 1.0)]
    rows += [(0, 3, "click", 1.0), (1, 3, "click", 1.0)]
    rows += [(0, 4, "click", 1.0), (3, 4, "click", 1.0)]
    ev = _events_tbl(spark, [(d * 86400 + s, u, k, v) for d, s, u, k, v in
                             [(d, i, u, k, v) for i, (d, u, k, v) in
                              enumerate(rows)]])
    out = {r.t: r for r in survival_curve(ev).collect()}
    # t=0: 1/4 dies -> S=0.75; t=1: 2/3 die -> S=0.25; t=3: last dies -> 0
    assert (out[0].n_at_risk, out[0].n_died) == (4, 1)
    assert abs(out[0].survival - 0.75) < 1e-9
    assert (out[1].n_at_risk, out[1].n_died) == (3, 2)
    assert abs(out[1].survival - 0.25) < 1e-9
    assert (out[3].n_at_risk, out[3].n_died) == (1, 1)
    assert out[3].survival == 0.0


# ---------------------------------------------------------------------------
# ks_drift / revenue_gini
# ---------------------------------------------------------------------------


def test_ks_detects_shift_and_passes_identical(spark):
    from opc_ua_data_pipeline_spark.operators.dq import ks_drift

    # 'stable': identical distributions both windows -> KS 0
    # 'shifted': disjoint supports -> KS 1
    rows = []
    for i in range(40):
        half = 0 if i < 20 else 20  # days 0..14 ref, 16.. cur
        d = 0 if i < 20 else 20
        rows.append((d * 86400 + i, i, "stable", float(i % 5)))
        rows.append((d * 86400 + i, i, "shifted",
                     float(i % 5) + (0.0 if i < 20 else 100.0)))
    ev = _events_tbl(spark, rows)
    out = {r.event_type: r for r in ks_drift(ev).collect()}
    assert out["stable"].ks_stat == 0.0 and not out["stable"].drifted
    assert out["shifted"].ks_stat == 1.0 and out["shifted"].drifted


def test_ks_abstains_on_one_window_types(spark):
    # round-6 advice: a type present in only ONE window used to divide
    # by n=0 (Spark NULL vs DuckDB inf) — the operator now abstains on
    # those types instead of emitting an engine-dependent row.
    from opc_ua_data_pipeline_spark.operators.dq import ks_drift

    rows = []
    for i in range(10):
        rows.append((i, i, "ref_only", float(i)))          # day 0 only
        rows.append((20 * 86400 + i, i, "cur_only", float(i)))
        rows.append((i, i, "both", float(i)))
        rows.append((20 * 86400 + i, i, "both", float(i)))
    out = {r.event_type: r for r in ks_drift(_events_tbl(spark, rows)).collect()}
    assert set(out) == {"both"}
    assert out["both"].ks_stat == 0.0 and not out["both"].drifted


def test_gini_extremes(spark):
    from opc_ua_data_pipeline_spark.operators.relational import revenue_gini

    def _orders(vals):
        return spark.createDataFrame(
            [Row(o_orderkey=i, o_custkey=i, o_totalprice=float(v))
             for i, v in enumerate(vals)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )

    equal = revenue_gini(_orders([100.0] * 10)).collect()[0]
    assert abs(equal.gini) < 1e-9  # perfect equality
    # one customer holds everything: G -> (n-1)/n
    concentrated = revenue_gini(
        _orders([0.0] * 9 + [1000.0])
    ).collect()[0]
    assert abs(concentrated.gini - 9 / 10) < 1e-9

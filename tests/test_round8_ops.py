"""Round-8 operators: embedding-space decontamination (bucketed audit
+ exact-recall contract) and the distwindow precomputed-cutpoint path."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# embedding_decontamination / decontam_recall
# ---------------------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_decontamination_flags_and_recall(spark):
    from opc_ua_data_pipeline_spark.operators.similarity import (
        decontam_recall,
        embedding_decontamination,
    )

    # bench_mod=20 -> vec_id 0 and 20 are benchmark; the rest train.
    rows = [
        Row(vec_id=0, embedding=[1.0, 1.0, 1.0, 1.0], label=0),    # bench 1111
        Row(vec_id=20, embedding=[1.0, -1.0, -1.0, 1.0], label=0), # bench 1001
        # near-copy of bench 0, SAME sign bucket -> caught
        Row(vec_id=1, embedding=[1.0, 1.0, 1.0, 0.9], label=1),
        # near-copy of bench 20, same bucket as 20 -> caught
        Row(vec_id=2, embedding=[1.0, -1.0, -1.0, 0.9], label=1),
        # high cosine with bench 0 but bucket 0111 (first dim barely
        # negative), where NO bench vector lives -> exact flags it,
        # the bucketed audit misses it
        Row(vec_id=3, embedding=[-0.01, 1.0, 1.0, 1.0], label=1),
        # orthogonal to both bench vectors -> never flagged
        Row(vec_id=4, embedding=[1.0, -1.0, 1.0, -1.0], label=1),
    ]
    emb = _emb_df(spark, rows)
    flagged = {
        r.vec_id: r
        for r in embedding_decontamination(emb, threshold=0.5).collect()
    }
    assert set(flagged) == {1, 2}
    assert flagged[1].n_bench_hits == 1
    assert flagged[1].max_score > 0.99

    rec = decontam_recall(emb, threshold=0.5).collect()[0]
    assert rec.n_exact == 3  # 1, 2 and the bucket-miss 3
    assert rec.n_caught == 2
    assert rec.recall == pytest.approx(2 / 3, abs=1e-9)


def test_decontamination_degenerate_empty(spark):
    from opc_ua_data_pipeline_spark.operators.similarity import (
        decontam_recall,
        embedding_decontamination,
    )

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0], label=0),  # bench
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0, 0.0], label=1),  # orthogonal
    ]
    emb = _emb_df(spark, rows)
    assert embedding_decontamination(emb).count() == 0
    rec = decontam_recall(emb).collect()[0]
    assert rec.n_exact == 0 and rec.n_caught == 0 and rec.recall is None


# ---------------------------------------------------------------------------
# cluster_best_representatives
# ---------------------------------------------------------------------------


def test_cluster_best_representatives_tiebreak_and_nulls(spark):
    from opc_ua_data_pipeline_spark.operators.graph import (
        cluster_best_representatives,
    )

    comp = spark.createDataFrame(
        [
            (1, 1), (2, 1), (3, 1),   # cluster 1
            (4, 4), (5, 4),           # cluster 4
            (6, 6),                   # singleton
            (7, 7), (8, 7),           # cluster 7: all-NULL scores
        ],
        "doc_id long, component_id long",
    )
    scored = spark.createDataFrame(
        [
            (1, 0.2), (2, 0.9), (3, 0.9),   # tie on 0.9 -> keep min id 2
            (4, None), (5, 0.1),            # NULL loses to any score
            (6, 0.5),
            (7, None), (8, None),           # all NULL -> min id, NULL score
        ],
        "doc_id long, quality_score double",
    )
    out = {
        r.component_id: r
        for r in cluster_best_representatives(comp, scored).collect()
    }
    assert out[1].keep_doc_id == 2 and out[1].keep_score == 0.9
    assert out[1].n_members == 3
    assert out[4].keep_doc_id == 5 and out[4].keep_score == 0.1
    assert out[6].keep_doc_id == 6
    assert out[7].keep_doc_id == 7 and out[7].keep_score is None


# ---------------------------------------------------------------------------
# distwindow: precomputed cutpoints reproduce the self-sampled result
# ---------------------------------------------------------------------------


def test_precomputed_cutpoints_match_self_sampled(spark):
    from opc_ua_data_pipeline_spark.operators.distwindow import (
        keyed_running_totals,
        sample_cutpoints,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
        F.col("id").alias("uid"),
    )
    cuts = sample_cutpoints(df, ["v", "uid"])
    assert set(cuts) == {"v", "uid"}
    auto = keyed_running_totals(
        df, ["k"], ["v", "uid"], rank_col="r", n_col="n"
    )
    pre = keyed_running_totals(
        df, ["k"], ["v", "uid"], rank_col="r", n_col="n", cuts=cuts["v"]
    )
    a = sorted((r.k, r.uid, r.r, r.n) for r in auto.collect())
    b = sorted((r.k, r.uid, r.r, r.n) for r in pre.collect())
    assert a == b


def test_sample_cutpoints_skips_probeless_columns(spark):
    from opc_ua_data_pipeline_spark.operators.distwindow import (
        sample_cutpoints,
    )

    df = spark.range(0, 100).select(
        F.array(F.col("id")).alias("arr"), F.col("id").alias("uid")
    )
    cuts = sample_cutpoints(df, ["arr", "uid"])
    assert "arr" not in cuts and "uid" in cuts

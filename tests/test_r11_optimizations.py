"""Focused tests for internals rewritten in optimization round 11:

* the star-forest convergence test (`_is_star_forest`) — fixpoint
  equivalence on adversarial shapes;
* the fused membership-only q_cc_delta_assign — equality with the
  explicit connected_components + cc_delta_update composition;
* the Arrow/NumPy pair scorer — bit-equality with the JVM fold;
* the conf-gated materializer — value identity across modes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.functions.materialize import materialize
from opc_ua_data_pipeline_spark.operators.graph import (
    _canon_edges,
    _is_star_forest,
    _large_star,
    _small_star,
    cc_delta_update,
    connected_components,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs] or [(0, 0)], "a long, b long"
    ).filter(F.lit(bool(pairs)))


def test_star_forest_check_positive_and_negative(spark):
    # canonical star forest: two stars {1:(2,3)}, {4:(5)}
    assert _is_star_forest(_canon_edges(_edges(spark, [(1, 2), (1, 3), (4, 5)])))
    # member under two centers
    assert not _is_star_forest(_canon_edges(_edges(spark, [(1, 3), (2, 3)])))
    # center that is also a member (a path)
    assert not _is_star_forest(_canon_edges(_edges(spark, [(1, 2), (2, 3)])))
    # empty set converges trivially
    assert _is_star_forest(_canon_edges(_edges(spark, [])))


def test_star_forest_iff_fixpoint(spark):
    """On a path (worst case for propagation) the check must flip to
    True exactly when one more alternation round stops changing the
    set — i.e. the check equals the old compare-to-previous scheme."""
    e = _canon_edges(_edges(spark, [(i, i + 1) for i in range(9)]))
    e = e.localCheckpoint(eager=True)
    for _ in range(10):
        if _is_star_forest(e):
            break
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
    # claimed fixpoint: one more round must be a no-op
    nxt = _small_star(_large_star(e))
    assert nxt.exceptAll(e).isEmpty() and e.exceptAll(nxt).isEmpty()
    # and the stars encode the true single component rooted at 0
    got = sorted(
        (r.v, r.u) for r in e.collect()
    )
    assert got == [(i, 0) for i in range(1, 10)]


def test_cc_delta_assign_equals_explicit_composition(spark):
    """The fused membership-only publish must be row-identical to the
    composition it replaced (full base labeling + cc_delta_update)."""
    from opc_ua_data_pipeline_spark.operators.graph import (
        CC_DELTA_MOD,
        CLUSTER_HAMMING_MAX,
        q_cc_delta_assign,
    )
    from opc_ua_data_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )
    from opc_ua_data_pipeline_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    edges = simhash_near_dup_pairs(
        docs, max_hamming=CLUSTER_HAMMING_MAX
    ).select("doc_a", "doc_b").localCheckpoint(eager=True)
    base = edges.filter(F.col("doc_b") % CC_DELTA_MOD != 0)
    delta = edges.filter(F.col("doc_b") % CC_DELTA_MOD == 0)
    comps0 = connected_components(docs.select("doc_id"), base)
    want = sorted(
        (r.doc_id, r.component_id)
        for r in cc_delta_update(comps0, delta).collect()
    )
    got = sorted(
        (r.doc_id, r.component_id)
        for r in q_cc_delta_assign(spark, SF_SMOKE).collect()
    )
    assert got == want


def test_arrow_pair_scorer_bit_equals_jvm_fold(spark):
    """embedding_neardup_pairs' NumPy kernel must reproduce the JVM
    zip_with/aggregate fold BIT-exactly (same IEEE op sequence)."""
    from opc_ua_data_pipeline_spark.operators.similarity import (
        NEARDUP_THRESHOLD,
        _pair_score,
        embedding_neardup_pairs,
        sign_bucket,
        _norm,
    )
    from opc_ua_data_pipeline_spark.tables import load_table

    corpus = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        (r.id_a, r.id_b): r.score
        for r in embedding_neardup_pairs(corpus).collect()
    }
    c1 = corpus.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    c2 = corpus.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    want = {
        (r.id_a, r.id_b): r.score
        for r in (
            c1.join(c2, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", _pair_score().alias("score"))
            .filter(F.col("score") >= NEARDUP_THRESHOLD)
        ).collect()
    }
    assert got == want  # exact float equality, on purpose


@pytest.mark.parametrize("mode", ["local", "persist"])
def test_materialize_modes_value_identical(spark, mode):
    prev = spark.conf.get("spark.opcua.materialize", "local")
    spark.conf.set("spark.opcua.materialize", mode)
    try:
        df = spark.range(100).withColumn(
            "v", (F.col("id") * 7 % 13).cast("long")
        )
        out = materialize(df.groupBy("v").count())
        assert sorted((r.v, r["count"]) for r in out.collect()) == sorted(
            (r.v, r["count"])
            for r in df.groupBy("v").count().collect()
        )
    finally:
        spark.conf.set("spark.opcua.materialize", prev)

"""Incremental IVF-PQ maintenance: delta assignments under frozen
codebooks equal a full re-assignment restricted to the new ids, and
the delta path never assigns an already-indexed vector."""

from __future__ import annotations

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.clustering import (
    DELTA_MOD,
    EMBED_DIM,
    K_CLUSTERS,
    KMEANS_ITERS,
    PQ_CODEBOOK_K,
    PQ_ITERS,
    PQ_SUBSPACES,
    _assign,
    _kmeans_loop,
    ivfpq_assign_delta,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_delta_equals_full_reassignment_on_new_ids(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") % DELTA_MOD != 0)
    got = sorted(
        tuple(r) for r in ivfpq_assign_delta(emb, base).collect()
    )

    # full re-assignment of ALL arrivals under the SAME frozen
    # (base-trained) codebooks, restricted to the new ids
    d_sub = EMBED_DIM // PQ_SUBSPACES
    _, coarse = _kmeans_loop(
        base.select("vec_id", "embedding"), K_CLUSTERS, KMEANS_ITERS
    )
    full = _assign(emb.select("vec_id", "embedding"), coarse).select(
        "vec_id", F.col("cluster").alias("cell")
    )
    for s in range(PQ_SUBSPACES):
        sub_all = emb.select(
            "vec_id",
            F.slice("embedding", s * d_sub + 1, d_sub).alias("embedding"),
        )
        _, cb = _kmeans_loop(
            base.select(
                "vec_id",
                F.slice("embedding", s * d_sub + 1, d_sub).alias(
                    "embedding"
                ),
            ),
            PQ_CODEBOOK_K,
            PQ_ITERS,
        )
        full = full.join(
            _assign(sub_all, cb).select(
                "vec_id", F.col("cluster").alias(f"code_{s}")
            ),
            "vec_id",
        )
    want = sorted(
        tuple(r)
        for r in full.filter(F.col("vec_id") % DELTA_MOD == 0).collect()
    )
    assert got == want

    # delta covers exactly the new ids, nothing already indexed
    new_ids = {
        r.vec_id
        for r in emb.filter(F.col("vec_id") % DELTA_MOD == 0).collect()
    }
    assert {t[0] for t in got} == new_ids

"""Arrow-matmul ANN variant ≡ the interpreted-fold contract variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.similarity import (
    N_QUERIES,
    brute_force_topk,
    brute_force_topk_arrow,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_arrow_matmul_matches_fold(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    fold = {
        (r["q_id"], r["rank"]): (r["c_id"], r["score"])
        for r in brute_force_topk(queries, emb).collect()
    }
    arrow = {
        (r["q_id"], r["rank"]): (r["c_id"], r["score"])
        for r in brute_force_topk_arrow(queries, emb).collect()
    }

    assert set(fold) == set(arrow)
    for key, (c_fold, s_fold) in fold.items():
        c_arr, s_arr = arrow[key]
        assert c_fold == c_arr, key
        assert abs(s_fold - s_arr) < 1e-9, key
    # k results per query, all queries present
    assert len(fold) == N_QUERIES * 10


def test_arrow_matmul_small_batches(spark):
    """Partial top-k across many Arrow batches must still merge to the
    exact global top-k (forces multiple batches per partition)."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        emb = load_table(spark, SF_DIR, "embeddings").repartition(4)
        queries = emb.filter(F.col("vec_id") < N_QUERIES)
        got = {
            (r["q_id"], r["rank"]): r["c_id"]
            for r in brute_force_topk_arrow(queries, emb).collect()
        }
        want = {
            (r["q_id"], r["rank"]): r["c_id"]
            for r in brute_force_topk(queries, emb).collect()
        }
        assert got == want
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )

"""Focused tests for the round-10 optimization rewrites: each pins the
rewritten internals against a naive spelling of the SAME semantics on a
small fixture (the oracle-parity suite separately pins the full contract
values; these isolate the specific identities the rewrites rely on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.clustering import (
    K_CLUSTERS,
    KMEANS_ITERS,
    _kmeans_loop,
)
from opc_ua_data_pipeline_spark.operators.graph import degree_assortativity
from opc_ua_data_pipeline_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _naive_assortativity(spark, edges):
    """The r9 directed-slot spelling, inlined as the trusted twin."""
    e = edges.select(F.col("u"), F.col("v"))
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    directed = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    dx = deg.select(F.col("x").alias("u"), F.col("d").alias("jd"))
    dy = deg.select(F.col("x").alias("v"), F.col("d").alias("kd"))
    m = (
        directed.join(dx, "u")
        .join(dy, "v")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("jd").cast("decimal(38,0)")).alias("sj"),
            F.sum(F.col("kd").cast("decimal(38,0)")).alias("sk"),
            F.sum((F.col("jd") * F.col("kd")).cast("decimal(38,0)")).alias(
                "sjk"
            ),
            F.sum((F.col("jd") * F.col("jd")).cast("decimal(38,0)")).alias(
                "sjj"
            ),
            F.sum((F.col("kd") * F.col("kd")).cast("decimal(38,0)")).alias(
                "skk"
            ),
        )
    )
    return m.selectExpr(
        "CAST(n AS BIGINT) AS n_edge_slots",
        "CAST(CAST(try_divide("
        "CAST(n * sjk - sj * sk AS DOUBLE),"
        "sqrt(CAST(n * sjj - sj * sj AS DOUBLE))"
        " * sqrt(CAST(n * skk - sk * sk AS DOUBLE)))"
        " AS DECIMAL(18,9)) AS DOUBLE) AS assortativity",
    )


def test_assortativity_moment_identities(spark):
    """The round-10 moment rewrite (sj=sk=Σd², sjj=skk=Σd³, sjk from the
    un-doubled edge join) must be BIT-identical to the directed-slot
    spelling — on a hub-skewed fixture with an isolated-pair edge."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (5, 6), (4, 7), (7, 8)],
        "u bigint, v bigint",
    )
    got = degree_assortativity(edges).collect()[0]
    want = _naive_assortativity(spark, edges).collect()[0]
    assert got["n_edge_slots"] == want["n_edge_slots"] == 14
    assert got["assortativity"] == want["assortativity"]


def test_assortativity_empty_edges(spark):
    """Degenerate input: zero edges → 0 slots, NULL assortativity (the
    r9 COUNT-based spelling's exact outputs)."""
    edges = spark.createDataFrame([], "u bigint, v bigint")
    row = degree_assortativity(edges).collect()[0]
    assert row["n_edge_slots"] == 0
    assert row["assortativity"] is None


def test_kmeans_assign_final_false_same_codebook(spark):
    """assign_final=False must return the IDENTICAL codebook the full
    loop trains (it only skips the final, discarded assignment)."""
    emb = load_table(spark, SF, "embeddings")
    full_assigned, full_cent = _kmeans_loop(emb, K_CLUSTERS, KMEANS_ITERS)
    skip_assigned, skip_cent = _kmeans_loop(
        emb, K_CLUSTERS, KMEANS_ITERS, assign_final=False
    )
    assert skip_assigned is None
    a = sorted(map(tuple, full_cent.collect()))
    b = sorted(map(tuple, skip_cent.collect()))
    assert a == b

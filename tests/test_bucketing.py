"""Bucketed co-located join: exchange-free plan + value equality."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from opc_ua_data_pipeline_spark.plans import formatted_plan
from opc_ua_data_pipeline_spark.tables import load_table

SF_CORRECT = "/root/testdata/sf0.01"

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_CORRECT, "orders")
    customer = load_table(spark, SF_CORRECT, "customer")
    write_bucketed(
        orders, "b_orders", "o_custkey", N_BUCKETS, path=str(base / "o")
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        N_BUCKETS,
        path=str(base / "c"),
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_custkey")
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # sortBy inside buckets also removes the Sort nodes.
    assert "Sort [" not in plan.replace("SortMergeJoin", ""), plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_custkey").groupBy(
        "c_mktsegment"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"),
    )
    orders = load_table(spark, SF_CORRECT, "orders")
    customer = load_table(spark, SF_CORRECT, "customer")
    plain = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"),
        )
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucketed_agg_reuses_layout(spark, bucketed_tables):
    """groupBy on the bucket key is exchange-free too."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = formatted_plan(agg)
    assert "Exchange" not in plan, plan

"""KMV sketch properties: merge identity (shard partials ≡ direct
build ≡ any repartitioning), estimator accuracy envelope, and the
Jaccard estimator on constructed-overlap fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.sketch import (
    KMV_K,
    kmv_distinct,
    kmv_sketches,
    kmv_source_overlap,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_shard_merge_is_the_direct_sketch(spark):
    """The (key, shard) partial build must equal the unsharded
    collect_set sort-cut — the merge identity a serving layer relies
    on when combining stored partials."""
    ev = load_table(spark, SF_DIR, "events")
    merged = {
        r["key"]: r["sketch"]
        for r in kmv_sketches(ev, "event_type", F.col("user_id"), "kmv").collect()
    }
    from opc_ua_data_pipeline_spark.operators.sketch import _h60

    direct = {
        r["key"]: r["sketch"]
        for r in ev.select(
            F.col("event_type").alias("key"), _h60(F.col("user_id"), "kmv").alias("h")
        )
        .groupBy("key")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, KMV_K).alias("sketch"))
        .collect()
    }
    assert merged == direct


def test_sketch_is_partitioning_invariant(spark):
    ev = load_table(spark, SF_DIR, "events")
    a = kmv_sketches(ev, "event_type", F.col("user_id"), "kmv")
    b = kmv_sketches(
        ev.repartition(7, "user_id"), "event_type", F.col("user_id"), "kmv"
    )
    assert sorted(map(tuple, ((r["key"], tuple(r["sketch"])) for r in a.collect()))) == sorted(
        map(tuple, ((r["key"], tuple(r["sketch"])) for r in b.collect()))
    )


def test_distinct_estimate_envelope(spark):
    """Exact below k; within ~4/sqrt(k-1) relative error above it."""
    ev = load_table(spark, SF_DIR, "events")
    rows = kmv_distinct(ev).collect()
    assert rows
    for r in rows:
        if r["n_sketch"] < KMV_K:
            assert r["distinct_est"] == float(r["exact_distinct"])
        else:
            rel = abs(r["distinct_est"] - r["exact_distinct"]) / r["exact_distinct"]
            assert rel < 4.0 / (KMV_K - 1) ** 0.5, (r, rel)


@pytest.fixture()
def overlap_docs(spark):
    """Three synthetic sources: A and B share exactly half their
    vocabulary; C is disjoint from both."""
    shared = " ".join(f"sh{i}" for i in range(400))
    only = lambda p: " ".join(f"{p}{i}" for i in range(400))
    rows = [
        (1, shared + " " + only("a"), "en", "A", 0),
        (2, shared + " " + only("b"), "en", "B", 0),
        (3, only("c"), "en", "C", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_jaccard_estimator_on_constructed_overlap(overlap_docs):
    out = {(r["s1"], r["s2"]): r for r in kmv_source_overlap(overlap_docs).collect()}
    ab = out[("A", "B")]
    # true jaccard = 400 shared / 1200 union = 1/3; k=256 sketch keeps
    # the estimate within a few standard errors (~0.03)
    assert abs(ab["jaccard_est"] - 1 / 3) < 0.12, ab
    assert abs(ab["union_est"] - 1200) / 1200 < 0.35, ab
    assert abs(ab["intersection_est"] - 400) / 400 < 0.5, ab
    for pair in [("A", "C"), ("B", "C")]:
        assert out[pair]["n_common"] == 0 and out[pair]["jaccard_est"] == 0.0


def test_overlap_runs_on_real_corpus(spark):
    out = kmv_source_overlap(load_table(spark, SF_DIR, "documents"))
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_common"] <= r["k_used"] <= KMV_K
        assert 0.0 <= r["jaccard_est"] <= 1.0

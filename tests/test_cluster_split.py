"""Leakage-free cluster split: near-dup cluster members always share a
split, singletons agree with the per-doc gate, and the per-doc gate
demonstrably CAN leak where the cluster gate cannot."""

from __future__ import annotations

import hashlib

from opc_ua_data_pipeline_spark.operators.graph import (
    cluster_split_assign,
    q_dedup_clusters,
)
from opc_ua_data_pipeline_spark.operators.training import (
    SPLITS,
    _hex_at,
    split_assign,
)

SF_DIR = "/root/testdata/sf0.001"


def _gate(key: int) -> str:
    h = hashlib.md5(f"{key}:split".encode()).hexdigest()[:8]
    for name, lo, hi in SPLITS:
        if (lo == 0 or h >= _hex_at(lo)) and (hi == 1.0 or h < _hex_at(hi)):
            return name
    raise AssertionError(h)


def test_cluster_members_share_split_and_singletons_agree(spark):
    comp = q_dedup_clusters(spark, SF_DIR)
    out = cluster_split_assign(comp).collect()
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r.component_id, set()).add(r.split)
    # no near-dup cluster straddles splits — the leakage guarantee
    assert all(len(s) == 1 for s in by_comp.values())
    # every split matches the md5 gate on the component id
    assert all(r.split == _gate(r.component_id) for r in out)
    # singletons (component == self) agree with the per-doc gate
    docs_split = {
        r.doc_id: r.split
        for r in split_assign(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ).collect()
    }
    for r in out:
        if r.doc_id == r.component_id:
            assert r.split == docs_split[r.doc_id]


def test_per_doc_gate_leaks_where_cluster_gate_cannot(spark):
    """Crafted near-dup pair whose members the per-doc gate separates:
    the cluster gate must place both in ONE split."""
    # find two ids with different per-doc splits (deterministic scan)
    a = 0
    b = next(i for i in range(1, 10_000) if _gate(i) != _gate(a))
    comp = spark.createDataFrame(
        [(a, a), (b, a)], "doc_id long, component_id long"
    )
    out = {r.doc_id: r.split for r in cluster_split_assign(comp).collect()}
    assert out[a] == out[b] == _gate(a)
    assert _gate(b) != _gate(a)  # the per-doc gate WOULD have split them

"""Property-based tests for the extension operators: Python mirrors
over generated inputs (hypothesis), plus the layout-independence
guarantee the hash-gate family is built on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.graph import connected_components
from opc_ua_data_pipeline_spark.operators.training import _word_ngrams

_slow = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=12
)


@_slow
@given(words=_words, n=st.integers(min_value=2, max_value=4))
def test_word_ngrams_match_python_sliding_window(spark, words, n):
    df = spark.createDataFrame([(words,)], "w array<string>")
    got = df.select(_word_ngrams(F.col("w"), n).alias("g")).head().g
    want = [
        " ".join(words[i : i + n]) for i in range(max(len(words) - n + 1, 0))
    ]
    assert got == want


class _UnionFind:
    def __init__(self, nodes):
        self.p = {x: x for x in nodes}

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ),
    min_size=0,
    max_size=20,
)


@_slow
@given(edges=_edges)
def test_connected_components_match_union_find(spark, edges):
    nodes = list(range(16))
    uf = _UnionFind(nodes)
    for a, b in edges:
        uf.union(a, b)
    want = sorted((x, uf.find(x)) for x in nodes)

    nodes_df = spark.createDataFrame([(x,) for x in nodes], "node long")
    edges_df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    got = sorted(
        (r.doc_id, r.component_id)
        for r in connected_components(nodes_df, edges_df).collect()
    )
    assert got == want


def test_hash_gate_family_is_layout_independent(spark):
    """The defining property of every sampling/split/shard operator:
    the selected row set is identical under any partitioning."""
    from opc_ua_data_pipeline_spark.operators.sampling import (
        per_key_cap,
        stratified_sample,
    )
    from opc_ua_data_pipeline_spark.operators.training import split_assign
    from opc_ua_data_pipeline_spark.tables import load_table

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents")
    events = load_table(spark, SF, "events")
    for op, df, key in [
        (lambda d: split_assign(d), docs, "doc_id"),
        (lambda d: per_key_cap(d, "source", "doc_id", 5), docs, "doc_id"),
        (
            lambda d: stratified_sample(
                d, "event_type", {"click": 0.3, "error": 1.0}, "event_id"
            ),
            events,
            "event_id",
        ),
    ]:
        base = sorted(r[key] for r in op(df).collect())
        shuffled = sorted(
            r[key] for r in op(df.repartition(17, "lang" if key == "doc_id" else "event_type")).collect()
        )
        one_part = sorted(r[key] for r in op(df.coalesce(1)).collect())
        assert base == shuffled == one_part
"""Large-star/small-star connected components (round-8 verdict item
7): same components as union-find on fixtures, star rounds bounded
logarithmically on the high-diameter path graph that defeated
min-label propagation, and the isolated/self-loop edge cases hold."""

from __future__ import annotations

import math

from opc_ua_data_pipeline_spark.operators.graph import (
    connected_components,
    connected_components_with_rounds,
)


def _cc(spark, nodes, edges, **kw):
    nodes_df = spark.createDataFrame([(x,) for x in nodes], "node long")
    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    labels, rounds = connected_components_with_rounds(
        nodes_df, edges_df, **kw
    )
    return sorted((r.doc_id, r.component_id) for r in labels.collect()), rounds


def test_path_graph_log_rounds(spark):
    """A 64-node path has diameter 63: label propagation needed ~63
    rounds; the star alternation must land within the log bound."""
    n = 64
    got, rounds = _cc(spark, range(n), [(i, i + 1) for i in range(n - 1)])
    assert got == [(i, 0) for i in range(n)]
    # Kiveris worst case is O(log^2 n); pin the practical log bound
    # (+1 round to observe the fixpoint)
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds


def test_mixed_components_and_isolated(spark):
    edges = [(3, 7), (7, 9), (12, 14), (14, 12), (5, 5)]
    got, rounds = _cc(spark, range(16), edges)
    want = {3: 3, 7: 3, 9: 3, 12: 12, 14: 12}
    assert got == [(i, want.get(i, i)) for i in range(16)]
    assert rounds <= 6


def test_empty_and_selfloop_edges(spark):
    got, rounds = _cc(spark, range(4), [])
    assert got == [(i, i) for i in range(4)]
    assert rounds == 0


def test_two_cliques_bridge(spark):
    """Dense near-dup shape: two 5-cliques joined by one bridge —
    converges in a couple of rounds."""
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    got, rounds = _cc(spark, range(15), k1 + k2 + [(4, 10)])
    want = {**{i: 0 for i in range(5)}, **{i: 0 for i in range(10, 15)}}
    assert got == [(i, want.get(i, i)) for i in range(15)]
    assert rounds <= 5


def test_public_wrapper_matches(spark):
    nodes_df = spark.createDataFrame([(x,) for x in range(8)], "n long")
    edges_df = spark.createDataFrame(
        [(0, 7), (7, 3), (2, 6)], "a long, b long"
    )
    got = sorted(
        (r.doc_id, r.component_id)
        for r in connected_components(nodes_df, edges_df).collect()
    )
    want = {7: 0, 3: 0, 0: 0, 2: 2, 6: 2}
    assert got == [(i, want.get(i, i)) for i in range(8)]

"""Incremental connected-components maintenance (round-9 verdict item
5): folding an edge delta into an existing labeling must be
indistinguishable from a full recompute, while the iterative fixpoint
only ever sees the contracted |delta|-bounded subgraph — untouched
components are never rescanned."""

from __future__ import annotations

from opc_ua_data_pipeline_spark.operators.graph import (
    cc_delta_update,
    connected_components,
    contract_delta_edges,
)


def _df_nodes(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "node long")


def _df_edges(spark, es):
    return spark.createDataFrame(es or [(0, 0)], "src long, dst long")


def _labels(df):
    return sorted((r.doc_id, r.component_id) for r in df.collect())


def test_delta_equals_full_recompute(spark):
    nodes = range(20)
    base = [(0, 1), (1, 2), (5, 6), (10, 11), (12, 13)]
    delta = [(2, 5), (11, 12), (17, 18)]
    comps0 = connected_components(
        _df_nodes(spark, nodes), _df_edges(spark, base)
    )
    got = _labels(cc_delta_update(comps0, _df_edges(spark, delta)))
    want = _labels(
        connected_components(
            _df_nodes(spark, nodes), _df_edges(spark, base + delta)
        )
    )
    assert got == want


def test_delta_with_new_nodes(spark):
    """Delta edges may introduce docs the base labeling never saw —
    both attached to old components and forming brand-new ones."""
    nodes = range(6)
    base = [(0, 1), (2, 3)]
    comps0 = connected_components(
        _df_nodes(spark, nodes), _df_edges(spark, base)
    )
    # 100 attaches to component 0; 200-201 is a brand-new component
    delta = [(100, 1), (200, 201)]
    got = dict(_labels(cc_delta_update(comps0, _df_edges(spark, delta))))
    assert got[100] == 0 and got[0] == 0 and got[1] == 0
    assert got[200] == 200 and got[201] == 200
    assert got[2] == 2 and got[3] == 2  # untouched
    assert len(got) == 9  # 6 base nodes + 3 new delta endpoints


def test_bounded_work_contraction(spark):
    """The fixpoint's input is the CONTRACTED delta: with 500 base
    components and a single delta edge, exactly one contracted edge
    (between the two touched labels) exists — the other 498
    components contribute nothing to the iterative step."""
    n = 1000
    base = [(2 * i, 2 * i + 1) for i in range(n // 2)]
    comps0 = connected_components(
        _df_nodes(spark, range(n)), _df_edges(spark, base)
    )
    delta = _df_edges(spark, [(3, 40)])
    contracted = contract_delta_edges(comps0, delta)
    rows = contracted.collect()
    assert len(rows) == 1
    assert {(r.a, r.b) for r in rows} == {(2, 40)}
    # intra-component delta edges vanish entirely: zero iterative work
    noop = contract_delta_edges(comps0, _df_edges(spark, [(40, 41)]))
    assert noop.count() == 0
    got = dict(
        _labels(cc_delta_update(comps0, _df_edges(spark, [(40, 41)])))
    )
    assert got[40] == 40 and got[41] == 40 and len(got) == n


def test_chained_merge_through_labels(spark):
    """A delta that chains three existing components through their
    labels must collapse them to the global min label."""
    nodes = range(9)
    base = [(0, 1), (3, 4), (6, 7)]
    comps0 = connected_components(
        _df_nodes(spark, nodes), _df_edges(spark, base)
    )
    delta = [(1, 3), (4, 6)]
    got = dict(_labels(cc_delta_update(comps0, _df_edges(spark, delta))))
    for x in (0, 1, 3, 4, 6, 7):
        assert got[x] == 0
    for x in (2, 5, 8):
        assert got[x] == x

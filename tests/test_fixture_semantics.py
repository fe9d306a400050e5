"""Reference-shaped semantic tests on the simulator fixture
(SURVEY.md §5.2-5.3): every FIXTURES.md corner row is present and the
operators reproduce the reference's behavior on opcua_data-shaped
input — including a DuckDB cross-check of the verbatim dashboard
alarm query.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.functions.fixtures import (
    deviation_fixture,
    opcua_fixture,
)
from opc_ua_data_pipeline_spark.functions.simulator import generate_rows
from opc_ua_data_pipeline_spark.operators.alarms import (
    deviation_alarms,
    edge_alarms,
    latched_error,
)
from opc_ua_data_pipeline_spark.operators.dashboard import reference_alarm_feed


@pytest.fixture(scope="module")
def fx(spark):
    df = opcua_fixture(spark, n_ticks=3600)
    df.cache().count()
    return df


def test_corner_rows_present(fx):
    vs = fx.select("value_str").filter(F.col("value_str").isNotNull())
    strs = {r[0] for r in vs.distinct().collect()}
    assert any(s.startswith("['Info:") for s in strs), "list-repr alarm rows"
    assert "" in strs and "[]" in strs, "empty and [] ActiveAlarms rows"
    assert "True" in strs, "boolean routed to value_str as Python repr"
    assert fx.filter(F.col("operator").isNull()).count() > 0, "NULL operator"
    dup = (
        fx.groupBy("metric", "time")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup > 0, "duplicate-timestamp rows for tiebreak pinning"
    # exactly one of value_num / value_str per row (init.sql semantics)
    both = fx.filter(
        F.col("value_num").isNotNull() & F.col("value_str").isNotNull()
    ).count()
    neither = fx.filter(
        F.col("value_num").isNull() & F.col("value_str").isNull()
    ).count()
    assert both == 0 and neither == 0


def test_reference_alarm_feed_vs_duckdb(spark, fx):
    got = reference_alarm_feed(fx).toPandas()
    con = duckdb.connect()
    pdf = fx.toPandas()
    con.register("opcua_data", pdf)
    want = con.execute(
        """
        WITH last_running AS (
          SELECT COALESCE(MAX("time"), TIMESTAMP '1970-01-01') AS clear_time
          FROM opcua_data WHERE metric = 'Status' AND value_str = 'Running'
        )
        SELECT o."time", translate(o.value_str, '[]''"', '') AS alarm_text, o.operator
        FROM opcua_data o, last_running lr
        WHERE o.metric = 'ActiveAlarms'
          AND o.value_str IS NOT NULL AND o.value_str <> '' AND o.value_str <> '[]'
          AND (o.value_str LIKE '%Error:%' OR o.value_str LIKE '%Info:%')
          AND o."time" > lr.clear_time
        ORDER BY o."time" DESC LIMIT 50
        """
    ).df()
    got_s = sorted(map(tuple, got.astype(str).values.tolist()))
    want_s = sorted(map(tuple, want.astype(str).values.tolist()))
    assert got_s == want_s


def test_deviation_rule_matrix(spark):
    """FIXTURES.md: rule 1 once, rule 2 on 3 consecutive, nothing on a
    2-run, target=0 guarded — with real Target/Actual metric pairs."""
    df = deviation_fixture(spark)
    actual = df.filter(F.col("metric") == "ActualPlacementRateCPH").select(
        "time", F.lit("PlacementRate").alias("metric"), "value_num"
    )
    target = df.filter(F.col("metric") == "TargetPlacementRateCPH").select(
        F.col("time").alias("t_time"), F.col("value_num").alias("target_value")
    )
    joined = actual.join(target, actual.time == target.t_time).select(
        "metric", "time", F.lit(0).alias("event_id"), "value_num", "target_value"
    )
    out = deviation_alarms(
        joined, ["metric"], ["time"], target=F.col("target_value")
    ).orderBy("time")
    rows = out.collect()
    texts = [r["alarm"] for r in rows]
    assert len(rows) == 3
    assert "Abweichung 15.00% (>10%)" in texts[0]  # rule 1 at i=1
    assert "3x in Folge" in texts[1] and "4.00%" in texts[1]  # i=3
    assert "3x in Folge" in texts[2] and "5.00%" in texts[2]  # i=4


def test_feeder_edge_transitions(spark, fx):
    got = edge_alarms(
        fx.filter(F.col("metric").like("Feeder%")),
        ["metric"],
        ["time"],
        200.0,
    ).collect()
    # expected transitions computed straight from the generator
    rows = generate_rows(3600)
    prev: dict[str, float] = {}
    expected = 0
    for _, metric, num, _, _ in rows:
        if metric.startswith("Feeder") and num is not None:
            if metric in prev and prev[metric] >= 200 and num < 200:
                expected += 1
            prev[metric] = num
    assert len(got) == expected > 0
    for r in got:
        assert r["prev_value"] >= 200 and r["value_num"] < 200


def test_latched_error_scenario(spark, fx):
    err = fx.filter(F.col("metric") == "CurrentError")
    out = latched_error(
        fx,
        key_cols=[],
        order_cols=["time", "metric"],
        set_when=(F.col("metric") == "CurrentError") & (F.col("value_str") != ""),
        clear_when=(F.col("metric") == "CurrentError") & (F.col("value_str") == ""),
        message=F.col("value_str"),
    )
    # during the fault window the error is latched on every row
    mid = out.filter(
        (F.col("time") > F.to_timestamp(F.lit("2024-06-01 08:10:30")))
        & (F.col("time") < F.to_timestamp(F.lit("2024-06-01 08:10:55")))
    )
    vals = {r["current_error"] for r in mid.collect()}
    assert vals == {"Error: Random Fault: Nozzle Clogged"}
    # after acknowledge it clears
    late = out.filter(F.col("time") > F.to_timestamp(F.lit("2024-06-01 08:12:00")))
    assert {r["current_error"] for r in late.collect()} == {""}


def test_wire_roundtrip_via_sim_source_shapes(spark):
    """wire_to_bronze reproduces the bronze rows from the wire format."""
    from opc_ua_data_pipeline_spark.operators.ingest import wire_to_bronze

    rows = generate_rows(60)
    wire = spark.createDataFrame(
        [
            (m, s if n is None else repr(n), t.isoformat())
            for (t, m, n, s, _) in rows
        ],
        "node_id string, value string, timestamp string",
    )
    bronze = wire_to_bronze(wire)
    got = sorted(
        (str(r["time"]), r["metric"], r["value_num"], r["value_str"])
        for r in bronze.collect()
    )
    want = sorted((str(t), m, n, s) for (t, m, n, s, _) in rows)
    assert got == want


def test_window_funnel_depth_chain_rules(spark):
    """Greedy-earliest chain semantics on a hand fixture: ordered
    steps count, out-of-order steps don't, and the window deadline is
    anchored at step 1."""
    import datetime

    from opc_ua_data_pipeline_spark.operators.relational import (
        window_funnel_depth,
    )

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, u, t_hours, typ):
        return (
            eid,
            base + datetime.timedelta(hours=t_hours),
            u,
            typ,
            1.0,
            "{}",
        )

    rows = [
        # user 1: full chain inside 72 h -> depth 4
        ev(1, 1, 0, "view"), ev(2, 1, 1, "click"),
        ev(3, 1, 2, "signup"), ev(4, 1, 3, "purchase"),
        # user 2: click BEFORE view -> chain stops at view (depth 1)
        ev(5, 2, 5, "click"), ev(6, 2, 10, "view"),
        # user 3: click after 72 h deadline -> depth 1
        ev(7, 3, 0, "view"), ev(8, 3, 100, "click"),
        # user 4: view->click ok, signup past deadline -> depth 2
        ev(9, 4, 0, "view"), ev(10, 4, 50, "click"),
        ev(11, 4, 80, "signup"),
        # user 5: no view at all -> absent from output
        ev(12, 5, 0, "purchase"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["user_id"]: r for r in window_funnel_depth(events).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["funnel_depth"] == 4
    assert out[2]["funnel_depth"] == 1
    assert out[3]["funnel_depth"] == 1
    assert out[4]["funnel_depth"] == 2
    # deadline anchored at t1: user 4's signup at +80h rejected even
    # though it is within 72h of the CLICK
    assert out[4]["t3"] is None

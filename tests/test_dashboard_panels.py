"""Every dashboard panel query (machine_dashboard.json's 16 rawSql
statements) replayed over the simulator fixture and cross-checked
against DuckDB — the 'a reference user can run every query they run
today' bar, panel by panel."""

from __future__ import annotations

import duckdb
import pytest

from opc_ua_data_pipeline_spark.functions.fixtures import opcua_fixture
from opc_ua_data_pipeline_spark.operators.panels import PANELS
from opc_ua_data_pipeline_spark.operators.rollups import machine_stats


@pytest.fixture(scope="module")
def panel_env(spark):
    bronze = opcua_fixture(spark, n_ticks=3600)
    bronze.cache().count()
    stats = machine_stats(bronze, "minute")
    stats.cache().count()
    con = duckdb.connect()
    con.register("opcua_data", bronze.toPandas())
    con.register("machine_stats_minute", stats.toPandas())
    return bronze, stats, con


@pytest.mark.parametrize("name", sorted(PANELS))
def test_panel_matches_duckdb(name, spark, panel_env):
    bronze, stats, con = panel_env
    builder, sql = PANELS[name]
    got = sorted(
        tuple(str(v) for v in row) for row in builder(bronze, stats).collect()
    )
    want = sorted(tuple(str(v) for v in row) for row in con.execute(sql).fetchall())
    assert got == want, f"{name}: {got[:3]} vs {want[:3]}"
    if name.startswith(("stat_", "rollup_", "series_")) or name in (
        "production_info",
        "recent_alarms",
    ):
        assert len(got) > 0, f"{name} returned no rows on the fixture"

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in :mod:`opc_ua_data_pipeline_spark`; this
module only merges the per-operator-family registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opc_ua_data_pipeline_spark.operators import (
    alarms,
    anomaly,
    clustering,
    dashboard,
    dedup,
    graph,
    ingest,
    layout,
    multimodal,
    relational,
    rollups,
    sampling,
    similarity,
    skew,
    text,
    training,
)
from opc_ua_data_pipeline_spark.session import apply_runtime_confs

_MODULES = [
    ingest,
    rollups,
    dashboard,
    alarms,
    anomaly,
    relational,
    dedup,
    graph,
    clustering,
    similarity,
    text,
    multimodal,
    skew,
    sampling,
    training,
    layout,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the minute rollup
    (machine_stats_minute, database/init.sql:37-48) over the telemetry
    view — the reference's most load-bearing query shape."""
    apply_runtime_confs(spark)
    return rollups.q_rollup_minute(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same column names)."""
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out

"""Local replica of the driver's correctness gate.

For every ``queries()`` entry with an ``oracle_sql()`` counterpart,
run the Spark DataFrame and the DuckDB SQL on the same parquet tables
and compare row count, column names, and an order-insensitive value
rendering — the strictest local approximation of the driver's
value-hash comparison.

Round 11 (r10 verdict item 2 — the suite must fit the driver's verify
budget): the ~219 per-query executions are submitted from a small
thread pool ONCE per session instead of sequentially per test.  Spark
happily overlaps independent jobs (optimization guide §2.6) — actions
were only sequential because pytest called them sequentially, and each
query at sf0.01 is scheduler-latency-bound, not CPU-bound, so 8
in-flight queries back-fill each other's stage tails.  Each worker
also runs its DuckDB oracle (its own connection; DuckDB releases the
GIL).  The parametrized tests keep their ids and per-query failure
granularity: they only COMPARE the precomputed pair (and re-raise the
worker's exception for their query, if any).  Results are
deterministic, so concurrency cannot change any value.
"""

from __future__ import annotations

import datetime
import math
from concurrent.futures import ThreadPoolExecutor

import duckdb
import pytest

import __spark_entry__ as entry_mod
from opc_ua_data_pipeline_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.01"
_POOL_WORKERS = 8


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    """Render a cell deterministically (mimic a value-hash)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr of the exact double
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


# full union including pytest-only spellings (the registry trim must
# not lose value-level verification)
QUERIES = entry_mod.all_queries()
ORACLES = entry_mod.all_oracle_sql()


def _run_one(spark, name):
    """Worker: one query's Spark result + its DuckDB oracle result."""
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        return spark_cols, spark_rows, None, None
    con = _duck(SF_DIR)
    try:
        res = con.execute(ORACLES[name])
        duck_cols = [d[0].lower() for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()
    return spark_cols, spark_rows, duck_cols, duck_rows


@pytest.fixture(scope="session")
def parity_results(spark):
    """All query/oracle result pairs, computed ONCE with overlapped
    Spark jobs.  Per-query exceptions are captured, not raised — the
    owning test re-raises so failure granularity is unchanged."""
    out: dict[str, object] = {}

    def safe(name):
        try:
            return name, _run_one(spark, name)
        except BaseException as exc:  # re-raised by the owning test
            return name, exc

    with ThreadPoolExecutor(max_workers=_POOL_WORKERS) as ex:
        for name, r in ex.map(safe, sorted(QUERIES)):
            out[name] = r
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, parity_results):
    r = parity_results[name]
    if isinstance(r, BaseException):
        raise r
    spark_cols, spark_rows, duck_cols, duck_rows = r

    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_set = _rows_to_set(spark_cols, spark_rows)
    d_set = _rows_to_set(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 6

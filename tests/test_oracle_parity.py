"""Local replica of the driver's correctness gate.

For every ``queries()`` entry with an ``oracle_sql()`` counterpart,
run the Spark DataFrame and the DuckDB SQL on the same parquet tables
and compare row count, column names, and an order-insensitive value
rendering — the strictest local approximation of the driver's
value-hash comparison.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from opc_ua_data_pipeline_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.01"


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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return

    con = _duck(SF_DIR)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

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

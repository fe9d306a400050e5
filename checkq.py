"""Ad-hoc single-query oracle check: python checkq.py name [name...]

Same compare as local_correctness.py but for a named subset — the
fast inner loop while developing a new contract query.
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from local_correctness import _norm, _schema_sig
from opc_ua_data_pipeline_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    names = sys.argv[1:]
    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries, oracles = entry_mod.all_queries(), entry_mod.all_oracle_sql()
    rc = 0
    for name in names:
        spdf = queries[name](spark, SF_DIR).toPandas()
        dpdf = con.execute(oracles[name]).df()
        cols = sorted(spdf.columns)
        sig_a, sig_b = _schema_sig(spdf), _schema_sig(dpdf)
        ok_schema = sig_a == sig_b
        a = sorted(
            "|".join(_norm(v) for v in row)
            for row in spdf[cols].itertuples(index=False, name=None)
        )
        b = (
            sorted(
                "|".join(_norm(v) for v in row)
                for row in dpdf[sorted(dpdf.columns)].itertuples(
                    index=False, name=None
                )
            )
            if ok_schema
            else []
        )
        ok = ok_schema and a == b
        print(
            f"{name}: rows {len(spdf)}/{len(dpdf)} schema={ok_schema} "
            f"values={'OK' if ok else 'MISMATCH'}"
        )
        if not ok:
            rc = 1
            if not ok_schema:
                print("  spark cols:", [f"{c}:{t}" for c, t in sig_a])
                print("  duck  cols:", [f"{c}:{t}" for c, t in sig_b])
            else:
                for x, y in zip(a, b):
                    if x != y:
                        print("  spark:", x[:300])
                        print("  duck :", y[:300])
                        break
    return rc


if __name__ == "__main__":
    sys.exit(main())

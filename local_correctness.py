"""Local replica of the driver's correctness gate, as an artifact.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin at a
given SF dir and writes one JSON file with per-query row-count /
schema / value-match results — the same comparison
tests/test_oracle_parity.py makes, but over the FULL registry in one
pass and persisted, so each round's local verification state is
inspectable after the fact (the driver's own pass caps at 50 queries
per round; this file covers the rest).

Usage::

    python local_correctness.py [sf_dir] [out.json]

Defaults: sf_dir=/root/testdata/sf0.01, out=CORRECTNESS_LOCAL.json.
"""

from __future__ import annotations

import datetime
import json
import math
import sys

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from opc_ua_data_pipeline_spark.tables import TABLE_NAMES


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_LOCAL.json"
    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    report: dict[str, dict] = {}
    for name, fn in queries.items():
        entry: dict = {
            "rows_match": None,
            "schema_match": None,
            "values_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            entry["spark_rows"] = len(srows)
            if name in oracles:
                rel = con.execute(oracles[name])
                dcols = [d[0] for d in rel.description]
                drows = rel.fetchall()
                entry["oracle_rows"] = len(drows)
                entry["rows_match"] = len(srows) == len(drows)
                entry["schema_match"] = sorted(scols) == sorted(dcols)
                oi = sorted(range(len(scols)), key=lambda i: scols[i])
                od = sorted(range(len(dcols)), key=lambda i: dcols[i])
                a = sorted("|".join(_norm(r[i]) for i in oi) for r in srows)
                b = sorted("|".join(_norm(r[i]) for i in od) for r in drows)
                entry["values_match"] = a == b
            else:
                entry["err"] = "no_oracle"
        except Exception as exc:  # keep going; record the failure
            entry["err"] = f"{type(exc).__name__}: {exc}"[:400]
        report[name] = entry
        print(
            name,
            "OK"
            if entry["values_match"]
            else (entry["err"] or "MISMATCH"),
            flush=True,
        )
    payload = {"sf_dir": sf_dir, "results": report}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    bad = [
        n
        for n, e in report.items()
        if e["err"] not in (None, "no_oracle") or e["values_match"] is False
    ]
    print("WROTE", out_path, "queries:", len(report), "failures:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local replica of the driver's correctness gate, as an artifact.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin at a
given SF dir and writes one JSON file with per-query row-count /
schema / value-match results — the same comparison
tests/test_oracle_parity.py makes, but over the FULL registry in one
pass and persisted, so each round's local verification state is
inspectable after the fact (the driver's own pass caps at 50 queries
per round; this file covers the rest).

The value compare is deliberately DTYPE-SENSITIVE, mirroring the
driver's pandas-based value hash: the driver canonicalizes through
pandas frames, where Spark DECIMAL columns arrive as ``Decimal``
objects but DuckDB DECIMALs arrive as float64, and integer-vs-float
dtype splits (DuckDB HUGEINT→float64) change the hashed repr even
when values are numerically equal.  Both classes produced
false-negative driver rows in rounds 1-2 while a ``str()``-based
compare stayed green, so ``_norm`` keeps Decimal / int / float
distinguishable on purpose.

Usage::

    python local_correctness.py [sf_dir] [out.json]

Defaults: sf_dir=/root/testdata/sf0.01, out=CORRECTNESS_LOCAL.json.
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import sys

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from opc_ua_data_pipeline_spark.tables import TABLE_NAMES


def _dtype_sig(series):
    """Canonical dtype signature for the driver-mirroring schema compare.

    Round 6 proved name-only schema comparison is too weak: the driver
    flagged ``error_burst_windows`` schema_match=false because DuckDB's
    ``to_timestamp()`` yields TIMESTAMP WITH TIME ZONE (tz-aware
    datetime64 in pandas) while Spark's ``timestamp_seconds`` is plain
    TIMESTAMP — identical column names, different types.  This
    signature keeps tz-awareness distinct while canonicalizing the
    pairs the driver demonstrably tolerates (DATE objects vs midnight
    datetime64 — round-1 cohort/funnel queries were fully green; int /
    float width skew, whose value reprs are already compared exactly
    by ``_norm``).
    """
    import numpy as np
    import pandas as pd

    dt = series.dtype
    if isinstance(dt, pd.DatetimeTZDtype):
        return "timestamptz"
    s = str(dt)
    if s.startswith("datetime64"):
        # Midnight-only datetime64 is how DuckDB renders DATE through
        # .df(); Spark DATE arrives as object(datetime.date).  The
        # driver hashes those as equal, so collapse the midnight case.
        nonnull = series.dropna()
        if len(nonnull) and (
            pd.DatetimeIndex(nonnull).normalize() == pd.DatetimeIndex(nonnull)
        ).all():
            return "date_or_midnight"
        return "timestamp"
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    if s == "object":
        nonnull = series.dropna()
        if not len(nonnull):
            return "empty"
        v = nonnull.iloc[0]
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, datetime.datetime):
            return "timestamptz" if v.tzinfo else "timestamp"
        if isinstance(v, datetime.date):
            return "date_or_midnight"
        if isinstance(v, str):
            return "string"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array"
        if isinstance(v, (bool, np.bool_)):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        return "object"
    return s


def _schema_sig(pdf):
    """Sorted (column, canonical dtype) pairs for a pandas frame."""
    return sorted((c, _dtype_sig(pdf[c])) for c in pdf.columns)


def _norm(v):
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, decimal.Decimal):
        # Keep Decimal distinct from float: the driver hashes the
        # pandas object repr, so Decimal('1.5') != 1.5 over there too.
        return f"Decimal({v})"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (int, np.integer)):
        return f"int:{int(v)}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = (
            pd.Timestamp(v).tz_localize(None)
            if getattr(v, "tzinfo", None)
            else pd.Timestamp(v)
        )
        # DATE columns arrive as datetime.date from Spark but
        # datetime64 (midnight) from DuckDB's .df(); the driver's hash
        # tolerates that pair (cohort/funnel/set-op queries were green
        # in round 1), so canonicalize midnight to the date string.
        iso = ts.isoformat()
        return iso[:-9] if iso.endswith("T00:00:00") else iso
    if isinstance(v, (list, tuple, np.ndarray)):
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
    queries, oracles = entry_mod.all_queries(), entry_mod.all_oracle_sql()
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
            # Go through the SAME pandas bridges the driver uses
            # (toPandas / duckdb .df()): they are where dtype skew is
            # introduced (DuckDB HUGEINT/DECIMAL -> float64, Spark
            # DECIMAL -> Decimal objects), so collect()/fetchall()
            # would hide exactly the mismatches we need to see.
            spdf = fn(spark, sf_dir).toPandas()
            entry["spark_rows"] = len(spdf)
            if name in oracles:
                dpdf = con.execute(oracles[name]).df()
                entry["oracle_rows"] = len(dpdf)
                entry["rows_match"] = len(spdf) == len(dpdf)
                sig_a, sig_b = _schema_sig(spdf), _schema_sig(dpdf)
                entry["schema_match"] = sig_a == sig_b
                if not entry["schema_match"]:
                    entry["schema_diff"] = {
                        "spark": [f"{c}:{t}" for c, t in sig_a],
                        "oracle": [f"{c}:{t}" for c, t in sig_b],
                    }
                cols = sorted(spdf.columns)
                a = sorted(
                    "|".join(_norm(v) for v in row)
                    for row in spdf[cols].itertuples(index=False, name=None)
                )
                b = sorted(
                    "|".join(_norm(v) for v in row)
                    for row in dpdf[sorted(dpdf.columns)].itertuples(
                        index=False, name=None
                    )
                )
                entry["values_match"] = a == b
                if not entry["values_match"]:
                    entry["first_diff"] = next(
                        (
                            {"spark": x, "oracle": y}
                            for x, y in zip(a, b)
                            if x != y
                        ),
                        None,
                    )
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
        if e["err"] not in (None, "no_oracle")
        or e["values_match"] is False
        or e["schema_match"] is False
    ]
    print("WROTE", out_path, "queries:", len(report), "failures:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

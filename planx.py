"""Capture .explain('formatted') for named queries to plans/r10/.

Usage: python planx.py before|after name [name...]
Writes plans/r10/<name>_<tag>.txt.  Read-only on the data; builds the
plan without executing it (explain is driver-side).
"""

from __future__ import annotations

import io
import os
import sys

from opc_ua_data_pipeline_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("planx")

    import __spark_entry__ as entry_mod

    queries = entry_mod.all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

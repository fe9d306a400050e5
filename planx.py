"""Capture .explain('formatted') for named queries to plans/<round>/.

Usage: python planx.py before|after name [name...]
Writes plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<tag>.txt (default round:
r11).  NOTE (round-10 ADVICE): plan CONSTRUCTION is not free of
execution — many query builders contain eager localCheckpoints (and the
driver-iterated loops they feed), so building these plans runs real
Spark jobs against $SPARK_GRAFT_SF_DIR; only the FINAL frame's plan is
captured without executing it.
"""

from __future__ import annotations

import io
import os
import sys

from opc_ua_data_pipeline_spark.session import get_spark


def main() -> int:
    if len(sys.argv) < 3 or sys.argv[1] not in ("before", "after"):
        print(__doc__)
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11")
    out_dir = os.path.join(os.path.dirname(__file__), "plans", rnd)
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

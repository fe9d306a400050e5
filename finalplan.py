"""Capture the POST-EXECUTION (AQE-final) physical plan for named queries.

Usage: python finalplan.py <tag> <name> [name...]

Unlike planx.py (pre-execution ``explain``), this EXECUTES each query
(full materialization via collect) and then dumps
``queryExecution().executedPlan()`` — with AQE on, that is the
re-optimized final plan including ``ReusedExchange`` / ``AQEShuffleRead``
nodes, which the pre-execution explain cannot show (round-10 batch-5
lesson: a duplicated subtree in explain output is NOT evidence of
duplicated execution; runtime exchange reuse must be read off the final
plan).  Writes plans/r11/<name>_<tag>.txt plus an Exchange/ReusedExchange
node-count summary to stdout.

Runs real Spark jobs against $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import re
import sys

from opc_ua_data_pipeline_spark.session import get_spark


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("finalplan")

    import __spark_entry__ as entry_mod

    queries = entry_mod.all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        df.collect()  # execute so AQE finalizes every sub-plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_reuse = len(re.findall(r"\bReusedExchange\b", plan))
        n_sub = len(re.findall(r"\bReusedSubquery\b", plan))
        print(
            f"wrote {path} ({len(plan)} chars): Exchange={n_ex} "
            f"ReusedExchange={n_reuse} ReusedSubquery={n_sub}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

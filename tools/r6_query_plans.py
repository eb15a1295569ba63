"""Dump .explain('formatted') for selected DECLARED queries
(__spark_entry__.queries()) at sf0.1.

Usage: python tools/r6_query_plans.py <outdir> <suffix> <q1,q2,...>
Run from a worktree of an older commit to produce 'before' plans.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(outdir, exist_ok=True)
    from bench import get_spark
    import __spark_entry__ as entry

    spark = get_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    sf = os.environ.get("GSK_EXTRA_SF", "/root/testdata/sf0.1")
    for name in names:
        df = qs[name](spark, sf)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()

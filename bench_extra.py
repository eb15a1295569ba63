"""Per-query noop-sink micro-bench over EVERY declared query in
__spark_entry__.queries() (guide §1.4: noop sink so the computation is
timed, not the sink; §1.5: jobs labelled for the UI).

This is NOT the driver bench (bench.py is frozen); it exists to (a)
locate slow operators and (b) record before/after evidence for
optimization rounds. Prints one JSON line per query and a sorted
summary.

Env:
  GSK_EXTRA_SF     input dir (default /root/testdata/sf0.1)
  GSK_EXTRA_RUNS   timed runs per query after 1 warm run (default 2)
  GSK_EXTRA_ONLY   comma-separated query names (default: all)
  SPARK_GRAFT_CPUS local[N] parallelism (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GSK_EXTRA_SF", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("GSK_EXTRA_RUNS", "2"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from bench import get_spark
    import __spark_entry__ as entry

    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    only = os.environ.get("GSK_EXTRA_ONLY", "")
    names = only.split(",") if only else list(qs)

    out = {}
    for name in names:
        name = name.strip()
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        try:
            fn = qs[name]
            def run():
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            run()  # warm (codegen+plan)
            warm = time.time() - t0
            best = float("inf")
            for _ in range(RUNS):
                t0 = time.time()
                run()
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
            print(json.dumps({"query": name, "best": round(best, 3),
                              "warm": round(warm, 3)}), flush=True)
        except Exception as e:  # keep sweeping; report at the end
            out[name] = None
            print(json.dumps({"query": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    ranked = sorted(((v, k) for k, v in out.items() if v is not None),
                    reverse=True)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS,
                      "total": round(sum(v for v, _ in ranked), 3),
                      "slowest": ranked[:12]}))


if __name__ == "__main__":
    main()

"""Scaling-efficiency evidence (north rule: throughput scaling efficiency
>= 0.8 between N and 4N executors; in-sandbox proxy = local[N] vs
local[4N] on identical input).

Runs bench.py in fresh subprocesses (fresh JVM per parallelism level),
same materialized corpus, min-of-K timing, and writes BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [N] [replicate]   (default N=8 -> 4N=32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, replicate: int, runs: int = 2) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "GSK_REPLICATE": str(replicate),
        "GSK_BENCH_RUNS": str(runs),
        "GSK_DRIVER_MEM": "40g",
        # warm=1 is essential: with a cold JVM the FIRST query measured
        # absorbs all JIT/codegen/session warmup (measured 3x inflation
        # on the first query at local[2]) and the efficiency ratio is
        # dominated by warmup, not by the job's scaling behavior
        "GSK_BENCH_WARM": "1",
        # rowpass FIRST: the first query in a session absorbs residual
        # JIT/codegen warmup beyond its own warm run (measured ~3x on a
        # cold JVM); running the kernel first leaves the headline query
        # fully steady-state
        "GSK_QUERIES": os.environ.get("GSK_SCALE_QUERIES", "rowpass,full_validation"),
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.strip().startswith("{")][-1]
    return json.loads(line)


def merge_min(results: list) -> dict:
    """Min per query across repeated runs of the same config."""
    out = dict(results[0])
    out["queries"] = {
        q: min(r["queries"][q] for r in results) for q in results[0]["queries"]
    }
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n4 = n * 4

    # interleave configs A/B/A/B: the host shows bursty CPU steal, so
    # back-to-back blocks of one config soak up a burst and bias the
    # comparison; min across interleaved reps is steal-robust
    small_runs, big_runs = [], []
    for i in range(reps):
        small_runs.append(run_bench(n, replicate, runs=2))
        big_runs.append(run_bench(n4, replicate, runs=2))
        print(f"rep {i}: {n}->{small_runs[-1]['queries']} "
              f"{n4}->{big_runs[-1]['queries']}", flush=True)
    small = merge_min(small_runs)
    big = merge_min(big_runs)

    rows = small["rows"]
    report = {"sf": small["sf"], "rows": rows, "n": n, "n4": n4}
    lines = [
        "# BENCH — measured baseline + scaling efficiency",
        "",
        f"Input: canonical corpus derived from `{small['sf']}/documents.parquet`, "
        f"replicated ×{replicate} → **{rows:,} sequences** (parquet, snappy).",
        f"Host: {os.cpu_count()} cores (Firecracker VM; CPU steal observed — "
        "timings are min-of-3 steady state).",
        "",
        "| job | local[{n}] sec | local[{n4}] sec | seq/s @{n} | seq/s @{n4} | efficiency |".format(n=n, n4=n4),
        "|---|---|---|---|---|---|",
    ]
    for q in small["queries"]:
        t_small, t_big = small["queries"][q], big["queries"][q]
        thr_small, thr_big = rows / t_small, rows / t_big
        eff = thr_big / (4.0 * thr_small)
        report[q] = {"t_n": t_small, "t_4n": t_big,
                     "thr_n": round(thr_small, 1), "thr_4n": round(thr_big, 1),
                     "efficiency": round(eff, 3)}
        lines.append(
            f"| {q} | {t_small:.2f} | {t_big:.2f} | {thr_small:,.0f} | "
            f"{thr_big:,.0f} | **{eff:.3f}** |")
    lines += [
        "",
        "Efficiency = throughput(4N) / (4 × throughput(N)). North-rule "
        "criterion: ≥ 0.8 on the same job at two parallelism levels.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(report, indent=2),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(report))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

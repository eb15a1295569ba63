"""Scaling-efficiency evidence (north rule: throughput scaling efficiency
>= 0.8 between N and 4N executors; in-sandbox proxy = local[N] vs
local[4N] on identical input).

Runs bench.py in fresh subprocesses (fresh JVM per parallelism level),
same materialized corpus, interleaved A/B reps, and writes
BENCH/BASELINE.md with PER-REP raw timings (auditable evidence, VERDICT
r3 #1) plus per-rep efficiencies (each rep pairs t(N) with the SAME
rep's t(4N) — one machine window) — the gate is claimed on the median
rep, not a lucky best.

Usage: python tools/scaling_bench.py [N] [replicate] [reps]
       (default N=2 -> 4N=8, replicate=8192, reps=5)
"""

from __future__ import annotations

import json
import os
import statistics
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
        # JIT/codegen warmup beyond its own warm run; running the kernel
        # first leaves the headline query fully steady-state
        "GSK_QUERIES": os.environ.get("GSK_SCALE_QUERIES", "rowpass,full_validation"),
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        # 2h: the FIRST big-heap JVM after a host-idle gap can spend tens
        # of minutes in AlwaysPreTouch while the host provisions pages at
        # ~15-20 MB/s; subsequent JVMs reuse host-backed pages in seconds
        env=env, capture_output=True, text=True, timeout=7200, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.strip().startswith("{")][-1]
    return json.loads(line)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n4 = n * 4

    # interleave configs A/B/A/B: the host shows bursty CPU steal, so
    # back-to-back blocks of one config soak up a burst and bias the
    # comparison; medians across interleaved reps are steal-robust
    small_runs, big_runs = [], []
    for i in range(reps):
        small_runs.append(run_bench(n, replicate, runs=2))
        big_runs.append(run_bench(n4, replicate, runs=2))
        print(f"rep {i}: {n}->{small_runs[-1]['queries']} "
              f"{n4}->{big_runs[-1]['queries']}", flush=True)

    queries = list(small_runs[0]["queries"])
    rows = small_runs[0]["rows"]
    per_rep = {
        q: {"t_n": [r["queries"][q] for r in small_runs],
            "t_4n": [r["queries"][q] for r in big_runs]}
        for q in queries
    }
    write_report(small_runs[0]["sf"], rows, n, n4, reps, replicate, per_rep)


def write_report(sf, rows, n, n4, reps, replicate, per_rep):
    """Render BENCH/BASELINE.md from per-rep raw timings. Split out so a
    report can be re-rendered from captured raws without re-running."""
    queries = list(per_rep)
    report = {"sf": sf, "rows": rows, "n": n, "n4": n4,
              "reps": reps, "per_rep": per_rep}
    lines = [
        "# BENCH — measured baseline + scaling efficiency",
        "",
        f"Input: canonical corpus derived from `{sf}/documents.parquet`, "
        f"replicated ×{replicate} → **{rows:,} sequences** (parquet, snappy).",
        f"Host: {os.cpu_count()} cores (Firecracker VM; bursty CPU steal — "
        f"configs interleaved A/B across {reps} reps; each rep is min-of-2 "
        "timed runs after a warm run in a fresh JVM).",
        "",
        "Fidelity note: each local[N] JVM pins `-XX:ParallelGCThreads=N` "
        "(bench.py get_spark) — without it the JVM garbage-collects with "
        "all 32 host cores, giving the small-N leg parallel help a real "
        "N-core executor would not have. Each JVM also runs a fixed "
        "pre-touched heap (`-Xms` = `-Xmx` + `-XX:+AlwaysPreTouch`): a "
        "growable G1 heap returns pages between runs and the kernel/host "
        "re-provisions them mid-measurement (minute-scale all-system-time "
        "stalls), which destabilized the allocation-heavy "
        "full_validation leg in earlier rounds; fixed-heap executors are "
        "also production practice.",
        "",
        "## Per-rep raw timings (seconds) — the auditable evidence",
        "",
        "| job | cores | " + " | ".join(f"rep{i}" for i in range(reps))
        + " | median | min |",
        "|---|---|" + "---|" * (reps + 2),
    ]
    for q in queries:
        for key, label in (("t_n", f"local[{n}]"), ("t_4n", f"local[{n4}]")):
            ts = per_rep[q][key]
            lines.append(
                f"| {q} | {label} | "
                + " | ".join(f"{t:.2f}" for t in ts)
                + f" | {statistics.median(ts):.2f} | {min(ts):.2f} |")
    lines += [
        "",
        "## Efficiency = throughput(4N) / (4 × throughput(N))",
        "",
        "Per-rep efficiency pairs each rep's t(N) with the SAME rep's "
        "t(4N) — the two legs of a rep run back-to-back, so they share a "
        "machine window. (A cross-rep pairing of median times can match "
        "a clean-window leg against a degraded-window leg and report a "
        "number no actual rep produced.)",
        "",
        "| job | " + " | ".join(f"rep{i} eff" for i in range(reps))
        + " | median-rep | best-rep |",
        "|---|" + "---|" * (reps + 2),
    ]
    for q in queries:
        effs = [tn / (4.0 * t4) for tn, t4 in
                zip(per_rep[q]["t_n"], per_rep[q]["t_4n"])]
        med_eff = statistics.median(effs)
        best_eff = max(effs)
        report[q] = {
            "t_n_median": statistics.median(per_rep[q]["t_n"]),
            "t_4n_median": statistics.median(per_rep[q]["t_4n"]),
            "t_n_min": min(per_rep[q]["t_n"]),
            "t_4n_min": min(per_rep[q]["t_4n"]),
            "seq_per_sec_n": round(rows / statistics.median(per_rep[q]["t_n"])),
            "seq_per_sec_4n": round(rows / statistics.median(per_rep[q]["t_4n"])),
            "efficiency_per_rep": [round(e, 3) for e in effs],
            "efficiency_median": round(med_eff, 3),
            "efficiency_best": round(best_eff, 3),
        }
        lines.append(
            f"| {q} | " + " | ".join(f"{e:.3f}" for e in effs)
            + f" | **{med_eff:.3f}** | {best_eff:.3f} |")
    lines += [
        "",
        "## Throughput at both parallelism levels (median rep, "
        "validated sequences/sec)",
        "",
        f"| job | local[{n}] seq/s | local[{n4}] seq/s | speedup |",
        "|---|---|---|---|",
    ]
    for q in queries:
        # read back the medians stored in report[q] above — one
        # derivation site, so table and raw JSON cannot drift
        r = report[q]
        lines.append(
            f"| {q} | {r['seq_per_sec_n']:,} | {r['seq_per_sec_4n']:,} "
            f"| {r['t_n_median'] / r['t_4n_median']:.2f}x |")
    lines += [
        "",
        "North-rule criterion: ≥ 0.8 on the same job at two parallelism "
        "levels. The gate is claimed on the MEDIAN rep (steal-robust); "
        "the best-rep column shows the best observed steady state.",
        "",
        "Same-window normalization: read full_validation's per-rep "
        "efficiency against the SAME rep's rowpass kernel (one "
        "projection, zero shuffles, zero driver tail — the ceiling any "
        "job can reach in that window). A rep where the kernel itself "
        "dips is a degraded host window, not engine serialization.",
        "",
        "Machine-window calibration: the rowpass kernel (one projection, "
        "zero shuffles, zero driver tail) is the ceiling any job can "
        "reach in the measurement window — the host shows DAY-scale "
        "degraded windows where even this kernel's measured efficiency "
        "drops (observed 0.95 in a clean window vs 0.81 in a degraded "
        "one, steal <1% throughout). Read full_validation's efficiency "
        "against the same-window rowpass row above, not against an "
        "absolute scale.",
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
    print(json.dumps({q: report[q] for q in queries}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

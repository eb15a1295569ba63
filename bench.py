"""Benchmark harness. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  GSK_REPLICATE        corpus replication factor (default 64)

The corpus (north-rule shape) is materialized once to parquet under
/tmp so the measured pipeline is scan -> vectorized row pass ->
aggregates -> verdicts, the same shape as the production job.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GSK_REPLICATE", "256"))


def get_spark(cpus: int) -> SparkSession:
    # Pin GC worker threads to the simulated core count: a local[N] JVM
    # otherwise runs GC with ALL host cores (32 here), so the small-N leg
    # of a scaling comparison gets out-of-band parallel help that a real
    # N-core executor would not have — inflating local[2] throughput and
    # depressing the measured N->4N efficiency. A real cluster's N-core
    # executor garbage-collects with N cores; this makes the local proxy
    # faithful to that.
    # Fixed pre-touched heap (-Xms=-Xmx + AlwaysPreTouch): with a growable
    # heap, G1 expands/shrinks between runs and the kernel re-zeroes the
    # returned pages MID-MEASUREMENT — vmstat shows minute-long storms of
    # ~25% all-system CPU time (us=1 sy=23) with zero disk I/O while the
    # worker threads sit in page-fault handlers. Allocation-heavy jobs
    # (full_validation) were unstable while the low-allocation rowpass
    # kernel was not, exactly this signature. Pre-committing the heap at
    # JVM startup moves all zeroing before the warm run (~5s one-time,
    # outside every timed window) and matches production executor
    # practice, where spark.executor.memory is a fixed heap.
    # default sized for the driver-bench corpus (1.28M rows): the fixed
    # heap is pre-touched, and cold host page provisioning can run at
    # ~15-20 MB/s — every unneeded GB is potential startup tax
    mem = os.environ.get("GSK_DRIVER_MEM", "12g")
    gc_opts = (f"-XX:ParallelGCThreads={max(2, cpus)} "
               f"-XX:ConcGCThreads={max(1, cpus // 4)} "
               f"-Xms{mem} -XX:+AlwaysPreTouch "
               + os.environ.get("GSK_XJAVA", ""))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("goskema_spark_bench")
        .config("spark.driver.extraJavaOptions", gc_opts)
        # InferFiltersFromGenerate duplicates the (non-codegen) violations
        # lambda expression into a redundant Filter below every explode —
        # excluding it halves the row-pass cost (measured 1.58s -> 0.58s
        # on 1.28M rows); semantics-neutral (explode already drops empties)
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


# FIXED partition count for the materialized corpus, independent of the
# measuring session's core count: parquet row groups are the unit of
# scan parallelism, and an earlier corpus written from a local[2]
# session produced 4 files x ONE 10M-row row group each — at local[8]
# only 4 cores could ever scan, silently capping measured scaling
# efficiency at 0.5. 64 ~6MB files parallelize at every tested level.
CORPUS_PARTS = 64


def corpus_path(sf_dir: str, replicate: int) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return f"/tmp/gsk_bench_corpus_{tag}_x{replicate}_p{CORPUS_PARTS}.parquet"


def ensure_corpus(spark: SparkSession, sf_dir: str, replicate: int) -> str:
    path = corpus_path(sf_dir, replicate)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from goskema_spark.corpus import scaled_corpus

        df = scaled_corpus(spark, sf_dir, replicate=replicate,
                           partitions=CORPUS_PARTS)
        df.write.mode("overwrite").parquet(path)
    return path


def main():
    from goskema_spark.corpus import corpus_schema, dim_source_df, row_id_col
    from goskema_spark.drift import histogram
    from goskema_spark.rowpass import validate_rows
    from goskema_spark.runner import validate
    from goskema_spark.stats import profile

    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_corpus(spark, SF_DIR, REPLICATE)
    dim = dim_source_df(spark)
    schema = corpus_schema()

    def load():
        return spark.read.parquet(path)

    n_rows = load().count()
    timings: dict[str, float] = {}

    runs = int(os.environ.get("GSK_BENCH_RUNS", "3"))
    do_warm = os.environ.get("GSK_BENCH_WARM", "1") != "0"

    def bench(name, fn, warm=True):
        if warm and do_warm:  # exclude JVM/codegen warmup
            fn()
        best = float("inf")
        for _ in range(runs):  # min-of-N: local-mode GC/JIT stalls are noise,
            t0 = time.time()   # steady-state throughput is the signal
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # headline: full validation (row pass + uniqueness + referential +
    # per-source verdicts) — the north-rule constraint-eval job
    def q_full():
        # production shape: ONE job materializes the report (violations +
        # per-partition counts) as parquet — the durable output — and the
        # violations/verdicts DataFrames are column-pruned reads of it
        res = validate(load(), schema, row_id_col(), dims={"dim_source": dim},
                       report_path=os.environ.get(
                           "GSK_REPORT_PATH", "/tmp/gsk_bench_report.parquet"),
                       report_partitions=CPUS)
        res.violations.write.format("noop").mode("overwrite").save()
        res.verdicts.write.format("noop").mode("overwrite").save()

    def q_rowpass():
        _, viols, _ = validate_rows(load(), schema, row_id_col())
        viols.write.format("noop").mode("overwrite").save()

    def q_stats():
        profile(load(), ["doc_id", "n_tok", "source"]).write.format("noop").mode("overwrite").save()

    def q_hist():
        histogram(load(), "n_tok", 0, 64, 16).write.format("noop").mode("overwrite").save()

    def q_clean_scan():
        _, _, clean = validate_rows(load(), schema, row_id_col())
        clean.select(F.sum("n_tok")).write.format("noop").mode("overwrite").save()

    # the headline query runs LAST: the first queries in a session absorb
    # residual JIT/codegen warmup beyond their own warm run (measured ~3x
    # inflation on a cold JVM; see BENCH/BASELINE.md methodology)
    all_queries = {
        "rowpass": q_rowpass,
        "stats_profile": q_stats,
        "ntok_histogram": q_hist,
        "clean_scan": q_clean_scan,
        "full_validation": q_full,
    }
    only = os.environ.get("GSK_QUERIES", "")
    selected = only.split(",") if only else list(all_queries)
    for name in selected:
        bench(name, all_queries[name])

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "validated sequences/sec (constraint-eval throughput)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "rows": n_rows,
        "cpus": CPUS,
        "replicate": REPLICATE,
        "seq_per_sec": (round(n_rows / timings["full_validation"], 1)
                        if "full_validation" in timings else None),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

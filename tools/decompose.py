"""Decompose full_validation wall time into phases + A/B shape variants.

Phases per run:
  plan    = validate() python call (driver-only plan construction)
  act1    = violations noop write (materializes fused report when persisted)
  act2    = verdicts noop write
Variants:
  fused_persist   = current runner shape (persist the report union)
  fused_nopersist = same plan, cache_violations=False (act1/act2 recompute)
  separate        = violations write + verdicts built from its own plan
  rowpass_only    = just the row pass (reference point)
  uniq_only       = uniqueness aggregate alone
  ref_only        = referential anti-join alone

Usage: SPARK_GRAFT_CPUS=32 GSK_REPLICATE=256 python tools/decompose.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, REPLICATE, SF_DIR, ensure_corpus, get_spark  # noqa: E402


def main():
    from goskema_spark.corpus import corpus_schema, dim_source_df, row_id_col
    from goskema_spark.referential import referential_violations
    from goskema_spark.rowpass import validate_rows
    from goskema_spark.runner import validate
    from goskema_spark.uniqueness import uniqueness_violations

    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_corpus(spark, SF_DIR, REPLICATE)
    dim = dim_source_df(spark)
    schema = corpus_schema()

    def load():
        return spark.read.parquet(path)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    runs = int(os.environ.get("GSK_BENCH_RUNS", "3"))

    def timeit(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    def run_variant(name, fn, warm=True):
        if warm:
            fn()
        best = None
        for _ in range(runs):
            r = fn()
            if best is None or r["total"] < best["total"]:
                best = r
        results[name] = {k: round(v, 3) for k, v in best.items()}
        print(name, results[name], flush=True)

    def fused(report_path):
        def inner():
            t0 = time.time()
            res = validate(load(), schema, row_id_col(), dims={"dim_source": dim},
                           report_path=report_path)
            t_plan = time.time() - t0
            t1 = timeit(lambda: noop(res.violations))
            t2 = timeit(lambda: noop(res.verdicts))
            return {"plan": t_plan, "act1": t1, "act2": t2,
                    "total": t_plan + t1 + t2}
        return inner

    def rowpass_only():
        t0 = time.time()
        _, viols, _ = validate_rows(load(), schema, row_id_col())
        t_plan = time.time() - t0
        t1 = timeit(lambda: noop(viols))
        return {"plan": t_plan, "act1": t1, "total": t_plan + t1}

    def uniq_only():
        t0 = time.time()
        df = load()
        uv = uniqueness_violations(df, "doc_id", "n_tok", row_id_col(), carry=["source"])
        t_plan = time.time() - t0
        t1 = timeit(lambda: noop(uv))
        return {"plan": t_plan, "act1": t1, "total": t_plan + t1}

    def ref_only():
        t0 = time.time()
        df = load()
        rv = referential_violations(df, "source", dim, "source", row_id_col(),
                                    code="business_rule", carry=["source"])
        t_plan = time.time() - t0
        t1 = timeit(lambda: noop(rv))
        return {"plan": t_plan, "act1": t1, "total": t_plan + t1}

    run_variant("rowpass_only", rowpass_only)
    run_variant("uniq_only", uniq_only)
    run_variant("ref_only", ref_only)
    run_variant("fused_parquet", fused("/tmp/gsk_decomp_report.parquet"))
    run_variant("fused_lazy", fused(None))

    print(json.dumps({"cpus": CPUS, "replicate": REPLICATE, "results": results}))


if __name__ == "__main__":
    main()

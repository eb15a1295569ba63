"""Dump .explain('formatted') for the five driver-bench query shapes.

Usage: python tools/r6_plans.py <outdir> [suffix]
Writes <outdir>/<query>_<suffix>.txt  (suffix default 'before').

The full_validation report is captured as three plans in one file:
the report relation (the single write job), the violations read, and
the verdicts aggregate.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs(outdir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from bench import CPUS, REPLICATE, SF_DIR, corpus_path, get_spark
    from pyspark.sql import functions as F
    from goskema_spark.corpus import corpus_schema, dim_source_df, row_id_col
    from goskema_spark.drift import histogram
    from goskema_spark.rowpass import validate_rows
    from goskema_spark.runner import validate
    from goskema_spark.stats import profile

    spark = get_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    path = corpus_path(SF_DIR, REPLICATE)
    dim = dim_source_df(spark)
    schema = corpus_schema()

    def load():
        return spark.read.parquet(path)

    def dump(name, text):
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {name}_{suffix}.txt")

    _, viols, clean = validate_rows(load(), schema, row_id_col())
    dump("rowpass", fmt(viols))
    dump("clean_scan", fmt(clean.select(F.sum("n_tok"))))
    dump("stats_profile", fmt(profile(load(), ["doc_id", "n_tok", "source"])))
    dump("ntok_histogram", fmt(histogram(load(), "n_tok", 0, 64, 16)))

    # full_validation: run once (writes the report) so we can also capture
    # the violations/verdicts read plans against the real report file
    res = validate(load(), schema, row_id_col(), dims={"dim_source": dim},
                   report_path="/tmp/gsk_plans_report.parquet",
                   report_partitions=CPUS)
    # re-build the report relation lazily (no write) for the plan text
    res2 = validate(load(), schema, row_id_col(), dims={"dim_source": dim})
    parts = [
        "==== report relation (the single write job) ====",
        fmt(res2.violations),
        "==== violations (column-pruned report read) ====",
        fmt(res.violations),
        "==== verdicts (one aggregate over the report) ====",
        fmt(res.verdicts),
    ]
    dump("full_validation", "\n".join(parts))


if __name__ == "__main__":
    main()

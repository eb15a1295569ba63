"""Phase profiler for the DRIVER-BENCH full_validation shape (sf dir +
replicate from env, like bench.py): splits one run into probe / build /
optimize / report-write / violations-read / verdicts phases.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r6_profile.py [cpus] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from bench import REPLICATE, SF_DIR, corpus_path, get_spark
    from pyspark.sql import functions as F
    from goskema_spark.corpus import corpus_schema, dim_source_df, row_id_col
    from goskema_spark.runner import validate

    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = corpus_path(SF_DIR, REPLICATE)
    dim = dim_source_df(spark)
    schema = corpus_schema()

    def load():
        return spark.read.parquet(path)

    # warm
    res = validate(load(), schema, row_id_col(), dims={"dim_source": dim},
                   report_path="/tmp/gsk_prof_report.parquet",
                   report_partitions=cpus)
    res.violations.write.format("noop").mode("overwrite").save()
    res.verdicts.write.format("noop").mode("overwrite").save()

    from goskema_spark.rowpass import validate_rows
    from goskema_spark.referential import referential_violations
    from goskema_spark.runner import _verdicts_from_report
    import goskema_spark.uniqueness as U

    uk = schema.unique_keys[0]
    out_reps = []
    for rep in range(reps):
        t = {}
        df = load()
        t0 = time.time()

        bc = getattr(uk, "broadcast", True)
        # r6: "auto" runs no probe job — AQE decides from runtime stats
        t["probe"] = time.time() - t0; t0 = time.time()

        # r6: mirror runner — validate_rows builds the filter-first
        # dirty-path violations with carry attached, ONE plan build
        carry = ["source"]
        ann, rp, _ = validate_rows(df, schema, row_id_col(), carry=carry)
        uv = U.uniqueness_violations(df, "doc_id", "_ord", row_id_col(),
                                     carry=carry, broadcast=bc)
        rv = referential_violations(df, "source", dim, "source",
                                    row_id_col(), code="invalid_enum",
                                    carry=carry)
        all_viols = rp.unionByName(uv).unionByName(rv)
        v_rec = (all_viols.withColumn("_rec", F.lit("v"))
                 .withColumn("_rows", F.lit(None).cast("bigint")))
        null_viol_cols = [F.lit(None).cast("string").alias(c)
                          for c in ("row_id", "path", "code", "message", "rule")]
        rows_rec = (df.groupBy("source")
                    .agg(F.count(F.lit(1)).cast("bigint").alias("_rows"))
                    .select(*null_viol_cols,
                            F.lit(None).cast("map<string,string>").alias("params"),
                            F.col("source"), F.lit("s").alias("_rec"),
                            F.col("_rows")))
        report = v_rec.unionByName(rows_rec)
        t["build_py"] = time.time() - t0; t0 = time.time()

        report._jdf.queryExecution().optimizedPlan()
        t["optimize"] = time.time() - t0; t0 = time.time()

        # mirror runner's unconditional repartition (r6)
        w = report.repartition(cpus) if cpus else report
        t["repart_gate"] = time.time() - t0; t0 = time.time()

        w.write.mode("overwrite").option("compression", "zstd") \
            .parquet("/tmp/gsk_prof_report.parquet")
        t["write"] = time.time() - t0; t0 = time.time()

        rpt = spark.read.parquet("/tmp/gsk_prof_report.parquet")
        (rpt.filter(F.col("_rec") == "v")
         .select("row_id", "path", "code", "message", "rule", "params", "source")
         .write.format("noop").mode("overwrite").save())
        t["viols_read"] = time.time() - t0; t0 = time.time()

        _verdicts_from_report(rpt, carry, "source").write.format(
            "noop").mode("overwrite").save()
        t["verdicts"] = time.time() - t0

        t = {k: round(v, 3) for k, v in t.items()}
        t["total"] = round(sum(t.values()), 3)
        t["cpus"] = cpus
        out_reps.append(t)
        print(json.dumps(t), flush=True)

    best = {k: min(r[k] for r in out_reps) for k in out_reps[0]}
    print("MIN: " + json.dumps(best), flush=True)


if __name__ == "__main__":
    main()

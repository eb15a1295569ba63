"""Violation-rate sensitivity bench for the row pass (VERDICT r3 #8):
times the rowpass kernel on corpora at ~0%, ~12% (the standard bench
derivation), and 50% row-level violation rates. The two-projection gate
should make clean corpora near-free and keep dirty corpora linear in
the firing-row count, not in the check count.

Usage: python tools/violbench.py [replicate]   (default 256 -> 1.28M rows)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from bench import CORPUS_PARTS, get_spark
    from pyspark.sql import functions as F
    from goskema_spark.corpus import (
        VOCAB, corpus_schema, row_id_col, scaled_corpus,
    )
    from goskema_spark.rowpass import validate_rows

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    def materialize(tag, df):
        path = f"/tmp/gsk_violbench_{tag}_x{replicate}.parquet"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df.write.mode("overwrite").parquet(path)
        return path

    # standard (~12% of rows violate something)
    std = scaled_corpus(spark, sf, replicate=replicate, partitions=CORPUS_PARTS)
    # clean: same table shape, corruption-free derivation
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    base = docs.select(
        F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.slice(F.transform(F.split(F.col("text"), " "),
                            lambda w: ((F.length(w) * 7) % VOCAB).cast("int")),
                1, 60).alias("tokens"),
        F.col("source").alias("source"),
        F.col("doc_id").cast("long").alias("_ord"))
    base = base.select("doc_id", "tokens",
                       F.size("tokens").cast("int").alias("n_tok"), "source", "_ord")
    reps = spark.range(replicate).select(F.col("id").alias("_rep"))
    clean = base.crossJoin(F.broadcast(reps)).select(
        F.concat("doc_id", F.lit("_r"), F.col("_rep").cast("string")).alias("doc_id"),
        "tokens", "n_tok", "source",
        (F.col("_ord") * replicate + F.col("_rep")).alias("_ord"),
    ).repartition(CORPUS_PARTS, "source", F.xxhash64("doc_id"))
    # half-dirty: every 2nd row gets an out-of-domain token appended
    half = clean.select(
        "doc_id",
        F.when(F.col("_ord") % 2 == 0,
               F.concat("tokens", F.array(F.lit(-1).cast("int"))))
        .otherwise(F.col("tokens")).alias("tokens"),
        "n_tok", "source", "_ord")
    # n_tok mismatch also fires on corrupted rows -> keep n_tok consistent
    half = half.withColumn("n_tok", F.size("tokens").cast("int"))

    paths = {"p00": materialize("clean", clean),
             "p12": materialize("std", std),
             "p50": materialize("half", half)}

    schema = corpus_schema()
    out = {}
    for tag, path in paths.items():
        def run(path=path):
            _, viols, _ = validate_rows(spark.read.parquet(path), schema,
                                        row_id_col())
            viols.write.format("noop").mode("overwrite").save()
        run()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        n = spark.read.parquet(path).count()
        v = validate_rows(spark.read.parquet(path), schema, row_id_col())[1]
        dirty_rows = v.select("row_id").distinct().count()
        out[tag] = {"sec": round(best, 3), "rows": n,
                    "dirty_pct": round(100.0 * dirty_rows / n, 2)}
        print(tag, out[tag], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

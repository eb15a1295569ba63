"""Benchmark decontamination: flag training documents sharing word
n-grams with a (small) evaluation/benchmark set — the standard
train-test-overlap hygiene pass of an LLM data pipeline (n-gram overlap
decontamination as in GPT-3 appendix C / PaLM; n=8..13 word grams).

Scale story (100 TB corpus, MB-scale benchmark): the benchmark n-gram
set is bounded by the benchmark suite size — thousands of documents,
~10^6 distinct grams — so it BROADCASTS; the corpus side explodes its
per-document distinct grams and probes the broadcast hash relation
map-side (no corpus-wide shuffle on gram), then partially aggregates
hit counts by doc_id. The only wide exchange is the final per-doc
count, keyed by the same doc_id the pipeline already partitions by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import ngram_array


def contamination_hits(docs: DataFrame, bench: DataFrame, n: int = 8,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document count of DISTINCT word n-grams shared with the
    benchmark set. Returns (id_col, n_hits) for contaminated documents
    only (n_hits >= 1); join `docs` back on id_col to drop or audit.

    `bench` must be small enough to broadcast after gram explosion —
    true for real benchmark suites; guard upstream if not."""
    bench_grams = (bench
                   .select(F.explode(ngram_array(F.col(text_col), n))
                           .alias("g"))
                   .distinct())
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngram_array(F.col(text_col), n)))
        .alias("g"))
    return (doc_grams
            .join(F.broadcast(bench_grams), "g")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_hits")))

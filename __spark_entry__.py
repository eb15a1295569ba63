"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship validation on sf0.001.
`queries()` / `oracle_sql()` expose each implemented operator with a
DuckDB-checkable oracle over the same parquet tables.

All validation queries run over the canonical tokenized corpus
(north-rule shape: doc_id string, tokens array<int32>, n_tok int32,
source string) derived deterministically from the `documents` table —
the derivation is implemented twice, in Spark (goskema_spark.corpus.
corpus_from_documents) and ANSI SQL (corpus_cte_sql), and verified
identical row-for-row in tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from goskema_spark.corpus import (
    MAX_LEN,
    MAX_NTOK,
    VOCAB,
    corpus_cte_sql,
    corpus_from_documents,
    corpus_schema,
    dim_source_df,
    row_id_col,
)
from goskema_spark.drift import histogram
from goskema_spark.referential import referential_violations
from goskema_spark.rowpass import validate_rows
from goskema_spark.runner import validate
from goskema_spark.stats import numeric_quantiles, profile
from goskema_spark.uniqueness import uniqueness_violations

ROW_ID_SQL = "coalesce(doc_id, 'row-' || CAST(_ord AS VARCHAR))"
DIM_IN = "(" + ",".join(f"'src{i}'" for i in range(20)) + ")"


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_from_documents(spark, sf_dir)


# --------------------------------------------------------------------------
# shared oracle SQL fragments (DuckDB dialect, over the `documents` view)
# --------------------------------------------------------------------------

def _rowpass_viols_sql() -> str:
    """Row-pass violations as (row_id, path, code, rule, source, _ord)."""
    return f"""
  SELECT {ROW_ID_SQL} AS row_id, '/doc_id' AS path, 'required' AS code,
         'required' AS rule, source, _ord FROM corpus WHERE doc_id IS NULL
  UNION ALL
  SELECT {ROW_ID_SQL}, '/tokens', 'required', 'required', source, _ord
  FROM corpus WHERE tokens IS NULL
  UNION ALL
  SELECT {ROW_ID_SQL}, '/n_tok', 'required', 'required', source, _ord
  FROM corpus WHERE n_tok IS NULL
  UNION ALL
  SELECT {ROW_ID_SQL}, '/source', 'required', 'required', source, _ord
  FROM corpus WHERE source IS NULL
  UNION ALL
  SELECT {ROW_ID_SQL}, '/tokens', 'too_short', 'array_min', source, _ord
  FROM corpus WHERE tokens IS NOT NULL AND len(tokens) < 1
  UNION ALL
  SELECT {ROW_ID_SQL}, '/tokens', 'too_long', 'array_max', source, _ord
  FROM corpus WHERE tokens IS NOT NULL AND len(tokens) > {MAX_LEN}
  UNION ALL
  SELECT {ROW_ID_SQL}, '/n_tok', 'too_small', 'min', source, _ord
  FROM corpus WHERE n_tok IS NOT NULL AND n_tok < 1
  UNION ALL
  SELECT {ROW_ID_SQL}, '/n_tok', 'too_big', 'max', source, _ord
  FROM corpus WHERE n_tok IS NOT NULL AND n_tok > {MAX_NTOK}
  UNION ALL
  SELECT {ROW_ID_SQL}, '/n_tok', 'business_rule', 'n_tok_matches_tokens', source, _ord
  FROM corpus WHERE n_tok IS NOT NULL AND tokens IS NOT NULL AND n_tok <> len(tokens)
  UNION ALL
  SELECT {ROW_ID_SQL}, '/tokens/' || CAST(u.i - 1 AS VARCHAR), 'domain_range',
         'elem_domain', source, _ord
  FROM corpus c CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(c.tokens))) AS i) u
  WHERE c.tokens[u.i] < 0 OR c.tokens[u.i] >= {VOCAB}
"""


def _uniq_viols_sql() -> str:
    return f"""
  SELECT {ROW_ID_SQL.replace('doc_id', 'c.doc_id').replace('_ord', 'c._ord')} AS row_id,
         '/doc_id' AS path, 'uniqueness' AS code, 'unique_by' AS rule,
         d.first AS first_ord, c._ord AS dup_ord, c.doc_id AS key_val,
         c.source AS source, c._ord AS _ord
  FROM corpus c JOIN (
    SELECT doc_id, MIN(_ord) AS first FROM corpus
    WHERE doc_id IS NOT NULL GROUP BY doc_id HAVING COUNT(*) > 1
  ) d ON c.doc_id = d.doc_id
  WHERE c._ord <> d.first
"""


def _ref_viols_sql() -> str:
    return f"""
  SELECT {ROW_ID_SQL} AS row_id, '/source' AS path, 'invalid_enum' AS code,
         'ref_source' AS rule, source AS got, source, _ord
  FROM corpus WHERE source IS NOT NULL AND source NOT IN {DIM_IN}
"""


def _with_corpus(body: str) -> str:
    return f"WITH corpus AS ({corpus_cte_sql()})\n{body}"


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation run (row pass + uniqueness + referential +
    verdicts) on sf0.001; returns the violations DataFrame."""
    corpus = _corpus(spark, "/root/testdata/sf0.001")
    res = validate(corpus, corpus_schema(), row_id_col(),
                   dims={"dim_source": dim_source_df(spark)})
    return res.violations.select("row_id", "path", "code", "message", "rule")


def _q_rowpass(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    _, viols, _ = validate_rows(corpus, corpus_schema(), row_id_col())
    return viols.select("row_id", "path", "code", "rule")


def _q_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    v = uniqueness_violations(corpus, "doc_id", "_ord", row_id_col())
    return v.select(
        "row_id", "path", "code", "rule",
        F.col("params")["first"].cast("bigint").alias("first_ord"),
        F.col("params")["dup"].cast("bigint").alias("dup_ord"),
        F.col("params")["key"].alias("key_val"),
    )


def _q_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    v = referential_violations(corpus, "source", dim_source_df(spark), "source", row_id_col())
    return v.select("row_id", "path", "code", "rule",
                    F.col("params")["got"].alias("got"))


def _q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return profile(corpus, ["doc_id", "n_tok", "source"], exact_distinct=True)


def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    h = histogram(corpus, "n_tok", 0, MAX_NTOK, 16)
    return h.select(F.col("bucket").cast("bigint").alias("bucket"),
                    F.col("bucket_lo").cast("double").alias("bucket_lo"),
                    F.col("bucket_hi").cast("double").alias("bucket_hi"),
                    F.col("cnt").cast("bigint").alias("cnt"))


def _q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    q = numeric_quantiles(corpus, "n_tok", (0.5, 0.9, 0.99), exact=True)
    return q.select(
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("min_v"), F.col("max_v"),
        F.round("avg_v", 4).alias("avg_v"),
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p99", 4).alias("p99"),
    )


def _q_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    res = validate(corpus, corpus_schema(), row_id_col(),
                   dims={"dim_source": dim_source_df(spark)})
    return res.verdicts.select(
        "source",
        F.col("rows").cast("bigint").alias("rows"),
        F.col("violations").cast("bigint").alias("violations"),
        "verdict",
    )


def _q_clean_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-array equality invariant surfaced as an oracle query: clean
    rows grouped by source with the sum of all token values — if the
    engine mutated any token array, the checksum diverges."""
    corpus = _corpus(spark, sf_dir)
    _, _, clean = validate_rows(corpus, corpus_schema(), row_id_col())
    return (
        clean.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.aggregate("tokens", F.lit(0).cast("bigint"),
                              lambda acc, t: acc + t)).cast("bigint").alias("tok_sum"),
            F.sum("n_tok").cast("bigint").alias("ntok_sum"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rowpass_violations": _q_rowpass,
        "uniqueness_violations": _q_uniqueness,
        "referential_violations": _q_referential,
        "stats_profile": _q_stats,
        "ntok_histogram": _q_histogram,
        "ntok_quantiles": _q_quantiles,
        "verdicts_by_source": _q_verdicts,
        "clean_token_checksum": _q_clean_checksum,
    }


def oracle_sql() -> dict[str, str]:
    rowpass = _rowpass_viols_sql()
    uniq = _uniq_viols_sql()
    ref = _ref_viols_sql()
    return {
        "rowpass_violations": _with_corpus(
            f"SELECT row_id, path, code, rule FROM ({rowpass})"),
        "uniqueness_violations": _with_corpus(
            f"SELECT row_id, path, code, rule, first_ord, dup_ord, key_val FROM ({uniq})"),
        "referential_violations": _with_corpus(
            f"SELECT row_id, path, code, rule, got FROM ({ref})"),
        "stats_profile": _with_corpus(f"""
SELECT * FROM (
  SELECT 'doc_id' AS col, COUNT(*) AS cnt,
         SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS nulls,
         COUNT(DISTINCT doc_id) AS n_distinct,
         CAST(MIN(doc_id) AS VARCHAR) AS min_v, CAST(MAX(doc_id) AS VARCHAR) AS max_v
  FROM corpus
  UNION ALL
  SELECT 'n_tok', COUNT(*),
         SUM(CASE WHEN n_tok IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT n_tok),
         CAST(MIN(n_tok) AS VARCHAR), CAST(MAX(n_tok) AS VARCHAR)
  FROM corpus
  UNION ALL
  SELECT 'source', COUNT(*),
         SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT source),
         CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
  FROM corpus
)"""),
        "ntok_histogram": _with_corpus(f"""
SELECT CAST(CASE WHEN n_tok < 0 THEN 0
            WHEN n_tok >= {MAX_NTOK} THEN 17
            ELSE CAST(FLOOR(n_tok / {MAX_NTOK / 16.0}) AS BIGINT) + 1 END AS BIGINT) AS bucket,
       CAST(0 + (CASE WHEN n_tok < 0 THEN 0
            WHEN n_tok >= {MAX_NTOK} THEN 17
            ELSE CAST(FLOOR(n_tok / {MAX_NTOK / 16.0}) AS BIGINT) + 1 END - 1) * {MAX_NTOK / 16.0} AS DOUBLE) AS bucket_lo,
       CAST(0 + (CASE WHEN n_tok < 0 THEN 0
            WHEN n_tok >= {MAX_NTOK} THEN 17
            ELSE CAST(FLOOR(n_tok / {MAX_NTOK / 16.0}) AS BIGINT) + 1 END) * {MAX_NTOK / 16.0} AS DOUBLE) AS bucket_hi,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM corpus WHERE n_tok IS NOT NULL
GROUP BY 1, 2, 3"""),
        "ntok_quantiles": _with_corpus("""
SELECT CAST(COUNT(n_tok) AS BIGINT) AS cnt,
       CAST(MIN(n_tok) AS DOUBLE) AS min_v,
       CAST(MAX(n_tok) AS DOUBLE) AS max_v,
       ROUND(AVG(n_tok), 4) AS avg_v,
       ROUND(quantile_cont(n_tok, 0.5), 4) AS p50,
       ROUND(quantile_cont(n_tok, 0.9), 4) AS p90,
       ROUND(quantile_cont(n_tok, 0.99), 4) AS p99
FROM corpus"""),
        "verdicts_by_source": _with_corpus(f"""
, allv AS (
  SELECT source, _ord FROM ({rowpass})
  UNION ALL SELECT source, _ord FROM ({uniq})
  UNION ALL SELECT source, _ord FROM ({ref})
)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS rows,
       CAST(COALESCE(v.nviol, 0) AS BIGINT) AS violations,
       CASE WHEN COALESCE(v.nviol, 0) > 0 THEN 'fail' ELSE 'pass' END AS verdict
FROM corpus c
LEFT JOIN (SELECT source, COUNT(*) AS nviol FROM allv GROUP BY source) v
  ON c.source IS NOT DISTINCT FROM v.source
GROUP BY c.source, v.nviol"""),
        "clean_token_checksum": _with_corpus(f"""
, bad AS (SELECT DISTINCT _ord FROM ({rowpass}))
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(list_sum(c.tokens)) AS BIGINT) AS tok_sum,
       CAST(SUM(c.n_tok) AS BIGINT) AS ntok_sum
FROM corpus c ANTI JOIN bad b ON c._ord = b._ord
GROUP BY c.source"""),
    }

"""Validator orchestration: full validation run -> violations, per-partition
verdicts, stats, drift, ledger rows.

Lifecycle (SURVEY §3.4): scan -> [explicit repartition by
(source, hash(doc_id))] -> ONE fused report job whose branch stages run
concurrently — vectorized row pass, uniqueness aggregate, referential
anti-join, and a column-pruned per-partition row count — persisted as a
tiny tagged relation from which the violations table and verdicts are
cached reads. Fail-fast vs collect follows reference api.go:147-156.

Per-partition verdicts use the *logical* partition (the `source` value by
default) rather than spark_partition_id(): physical partition ids are not
stable across cluster sizes, and the resume/ledger protocol needs a
partition identity that survives re-planning.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from goskema_spark.referential import referential_violations
from goskema_spark.rowpass import explode_violations, validate_rows
from goskema_spark.schema import TableSchema
from goskema_spark.uniqueness import uniqueness_violations

VIOLATION_COLS = ["row_id", "path", "code", "message", "rule", "params"]


@dataclass
class ValidationResult:
    annotated: DataFrame          # input + _violations array column
    violations: DataFrame         # union of row-pass + aggregate violations
    clean: DataFrame              # rows with zero violations (row-pass level)
    verdicts: DataFrame           # partition_col, rows, violations, verdict
    report: dict = dc_field(default_factory=dict)
    _cached: Optional[DataFrame] = None  # the persisted report relation

    def unpersist(self):
        if self._cached is not None:
            self._cached.unpersist()
        return self


def validate(
    df: DataFrame,
    schema: TableSchema,
    row_id: Column,
    dims: Optional[dict] = None,
    partition_col: str = "source",
    repartition: int = 0,
    cache_violations: bool = True,
    uniqueness_scope: Optional[DataFrame] = None,
) -> ValidationResult:
    """Run the full check set declared on `schema` against `df`.

    cache_violations persists the unified report relation (violations +
    per-partition row counts — tiny relative to the input at any sane
    violation rate), so the first action materializes everything in ONE
    Spark job and the violations table / verdicts are cached reads.
    Call result.unpersist() when done.

    uniqueness_scope: uniqueness is a GLOBAL property — when validating a
    subset (checkpoint resume), pass the full table here so duplicate
    detection and first/dup attribution stay identical to an
    uninterrupted run; the aggregate reads only (key, ordinal, partition)
    via column pruning, so the extra scan is cheap. Violations are then
    filtered to df's partitions.
    """
    dims = dims or {}
    if repartition:
        # north rule: explicit repartition by (source, hash(doc_id))
        df = df.repartition(repartition, F.col(partition_col), F.xxhash64(row_id))

    ann, rowpass_viols, clean = validate_rows(df, schema, row_id)

    # carry the logical partition through aggregate checks for verdicts
    carry = [partition_col] if partition_col in df.columns else []
    agg_viols = []
    # aggregate checks read the PLAIN input, not the annotated plan — they
    # never touch _violations, and keeping the giant check expression out
    # of their subtrees cuts driver-side analysis cost ~3x per run
    for uk in schema.unique_keys:
        ordinal = uk.ordinal or uk.column
        scope = uniqueness_scope if uniqueness_scope is not None else df
        uv = uniqueness_violations(scope, uk.column, ordinal, row_id, carry=carry,
                                   broadcast=getattr(uk, "broadcast", True))
        if uniqueness_scope is not None and carry:
            parts = df.select(F.col(partition_col).alias("_part")).distinct()
            uv = uv.join(F.broadcast(parts),
                         F.col(partition_col).eqNullSafe(F.col("_part")), "left_semi")
        agg_viols.append(uv)
    for fk in schema.foreign_keys:
        dim = dims.get(fk.dim_name)
        if dim is None:
            # dependency failure -> dependency_unavailable (errors.go:35)
            raise RuntimeError(f"dependency_unavailable: dimension '{fk.dim_name}' not provided")
        agg_viols.append(
            referential_violations(df, fk.column, dim, fk.dim_column,
                                   row_id, code=fk.code, carry=carry)
        )

    # row-pass violations with the partition column attached
    rp = explode_with_carry(ann, row_id, carry)
    all_viols = rp
    for v in agg_viols:
        all_viols = all_viols.unionByName(v)

    # ---- single-job report relation -----------------------------------
    # The violation branches AND the per-partition row-count branch union
    # into ONE plan, tagged by `_rec`. Materializing it is ONE Spark job:
    # the branch stages (row pass, uniqueness aggregate, referential
    # anti-join, row count) are independent and get scheduled
    # concurrently, and the result is tiny (violation-rate-bounded rows +
    # one row per logical partition), so persisting it makes the
    # violations table AND the verdicts cached reads instead of separate
    # full scans. The row-count branch is column-pruned by Catalyst to
    # the partition column only (no check expressions) — the cheapest
    # possible way to count rows the verdict stage needs; at 100 TB that
    # reads one dictionary-encoded column, not the corpus.
    v_rec = (all_viols
             .withColumn("_rec", F.lit("v"))
             .withColumn("_rows", F.lit(None).cast("bigint")))
    null_viol_cols = [F.lit(None).cast("string").alias(c)
                      for c in ("row_id", "path", "code", "message", "rule")]
    if carry:
        rows_rec = (df.groupBy(partition_col)
                    .agg(F.count(F.lit(1)).cast("bigint").alias("_rows")))
    else:
        rows_rec = df.agg(F.count(F.lit(1)).cast("bigint").alias("_rows"))
    rows_rec = rows_rec.select(
        *null_viol_cols,
        F.lit(None).cast("map<string,string>").alias("params"),
        *[F.col(c) for c in carry],
        F.lit("s").alias("_rec"),
        F.col("_rows"),
    )
    report = v_rec.unionByName(rows_rec)
    if cache_violations:
        report = report.persist()

    violations = report.filter(F.col("_rec") == "v").select(*VIOLATION_COLS, *carry)
    part_rows = report.filter(F.col("_rec") == "s")
    if carry:
        by_part_viol = (report.filter(F.col("_rec") == "v")
                        .groupBy(F.col(partition_col).alias("_pc"))
                        .agg(F.count(F.lit(1)).alias("violations")))
        # null-safe join: a NULL partition value is itself a logical partition
        verdicts = (
            part_rows.select(F.col(partition_col), F.col("_rows").alias("rows"))
            .join(by_part_viol, F.col(partition_col).eqNullSafe(F.col("_pc")), "left")
            .drop("_pc")
            .withColumn("violations", F.coalesce(F.col("violations"), F.lit(0)))
            .withColumn("verdict", F.when(F.col("violations") > 0, "fail").otherwise("pass"))
        )
    else:
        verdicts = report.agg(
            F.sum(F.when(F.col("_rec") == "s", F.col("_rows"))).alias("rows"),
            F.count(F.when(F.col("_rec") == "v", F.lit(1))).alias("violations"),
        ).withColumn("verdict", F.when(F.col("violations") > 0, "fail").otherwise("pass"))

    return ValidationResult(
        annotated=ann,
        violations=violations,
        clean=clean,
        verdicts=verdicts,
        _cached=report if cache_violations else None,
    )


def explode_with_carry(ann: DataFrame, row_id: Column, carry) -> DataFrame:
    v = ann.withColumn("_row_id", row_id).select(
        F.col("_row_id").alias("row_id"),
        F.explode(F.col("_violations")).alias("v"),
        *[F.col(c) for c in carry],
    )
    return v.select(
        "row_id", "v.path", "v.code", "v.message", "v.rule", "v.params", *carry
    )

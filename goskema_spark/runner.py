"""Validator orchestration: full validation run -> violations, per-partition
verdicts, stats, drift, ledger rows.

Lifecycle (SURVEY §3.4): scan -> [explicit repartition by
(source, hash(doc_id))] -> ONE fused report job whose branch stages run
concurrently — vectorized row pass, uniqueness aggregate, referential
anti-join, and a column-pruned per-partition row count — tagged by `_rec`
and unioned into a single report relation. Fail-fast vs collect follows
reference api.go:147-156.

Materialization strategy (the 100 TB design): pass `report_path` to write
the report ONCE as parquet in a single job; the violations table and the
verdicts are then cheap column-pruned reads of that file. This replaces a
`.persist()` of the report: violations are bounded by the violation rate,
not by a constant — at a 10% rate on 10^12 rows the report is 10^11
heavyweight struct rows, which no executor cache should hold (measured:
the persist caused GC stalls that erased all scaling; parquet
materialization restored it). Without `report_path` the result stays
fully lazy (each output recomputes its branch when actioned) — right for
single-output callers like `is_valid`.

Per-partition verdicts use the *logical* partition (the `source` value by
default) rather than spark_partition_id(): physical partition ids are not
stable across cluster sizes, and the resume/ledger protocol needs a
partition identity that survives re-planning. Verdicts are ONE hash
aggregate over the report — `max(_rows)` recovers the row count from the
's' record and `count_if(_rec = 'v')` the violation count, with no join
(NULL partition values group naturally).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from goskema_spark.referential import referential_violations
from goskema_spark.rowpass import validate_rows
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
    report_path: Optional[str] = None  # parquet materialization of the report
    _persisted: list = dc_field(default_factory=list)  # probe relations to release

    def unpersist(self):
        """Release any relations persisted for this run. Since r6 the
        broadcast='auto' path runs no probe at all (AQE picks the join
        from runtime stats, uniqueness.py) so nothing is persisted by
        default — kept as the stable lifecycle hook callers already
        wrap in try/finally."""
        for df in self._persisted:
            df.unpersist(blocking=False)
        self._persisted = []
        return self


def validate(
    df: DataFrame,
    schema: TableSchema,
    row_id: Column,
    dims: Optional[dict] = None,
    partition_col: str = "source",
    repartition: int = 0,
    report_path: Optional[str] = None,
    report_partitions: int = 0,
    uniqueness_scope: Optional[DataFrame] = None,
) -> ValidationResult:
    """Run the full check set declared on `schema` against `df`.

    report_path: parquet location for the one-job report materialization
    (see module docstring). None = fully lazy result.

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

    # carry the logical partition through aggregate checks for verdicts
    carry = [partition_col] if partition_col in df.columns else []
    ann, rowpass_viols, clean = validate_rows(df, schema, row_id, carry=carry)
    agg_viols = []
    # aggregate checks read the PLAIN input, not the annotated plan — they
    # never touch _violations, and keeping the giant check expression out
    # of their subtrees cuts driver-side analysis cost ~3x per run
    persisted: list = []
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

    # row-pass violations (carry already attached): validate_rows feeds
    # them from the filter-first dirty path — a codegen'd gate Filter
    # below the interpreted HOF body projection, NOT the guarded `ann`
    # shape, which pays interpreted per-row dispatch for every clean row
    # (rowpass.py _dirty_with_violations has the equivalence argument)
    all_viols = rowpass_viols
    for v in agg_viols:
        all_viols = all_viols.unionByName(v)

    # ---- single-job report relation -----------------------------------
    # The violation branches AND the per-partition row-count branch union
    # into ONE plan, tagged by `_rec`. Materializing it is ONE Spark job:
    # the branch stages (row pass, uniqueness aggregate, referential
    # anti-join, row count) are independent and get scheduled
    # concurrently. The row-count branch is column-pruned by Catalyst to
    # the partition column only (no check expressions) — at 100 TB that
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

    if report_path:
        # ONE job writes everything durably; downstream outputs are
        # column-pruned parquet reads, immune to executor-cache pressure.
        # report_partitions (typically = cluster cores): repartition —
        # NOT coalesce — the write to that many tasks/files. The report
        # is bounded by the violation rate, so without this the narrow
        # row-pass branch emits one (tiny) file per INPUT partition and
        # the single-threaded job-commit + footer overhead becomes a
        # non-scaling tail at high parallelism. coalesce(N) was measured
        # 40% SLOWER at 41M rows/local[8] (80-92s vs 56-62s): it folds
        # the whole upstream compute into N tasks, losing dynamic load
        # balancing across the input's finer partitioning. repartition
        # keeps the upstream stage wide and only shuffles the (small,
        # violation-rate-bounded) report rows into N write tasks.
        # r6: the repartition is unconditional again — the r5 skip gated
        # on df.rdd.getNumPartitions(), which (a) measured the INPUT
        # width while the report's width is the sum of its branch
        # widths (shuffle.partitions for the aggregate branches + input
        # width for the map branches), so skipping lost the output-file-
        # count control exactly when the report was wider than the
        # input, and (b) forced an extra physical-plan-to-RDD conversion
        # on the driver for every validate() call (ADVICE r5 #2).
        w = report
        if report_partitions:
            w = report.repartition(report_partitions)
        # zstd (guide §6): ~25% smaller report files than snappy at the
        # same write time — the violations/verdicts reads scan less
        w.write.mode("overwrite").option("compression", "zstd") \
            .parquet(report_path)
        report = df.sparkSession.read.parquet(report_path)
        violations = (report.filter(F.col("_rec") == "v")
                      .select(*VIOLATION_COLS, *carry))
    else:
        violations = all_viols

    verdicts = _verdicts_from_report(report, carry, partition_col)

    return ValidationResult(
        annotated=ann,
        violations=violations,
        clean=clean,
        verdicts=verdicts,
        report_path=report_path,
        _persisted=persisted,
    )


def _verdicts_from_report(report: DataFrame, carry, partition_col: str) -> DataFrame:
    """ONE aggregate, no join: every partition present in df has exactly
    one 's' record carrying its row count (max() recovers it), and its
    violation rows all carry the same partition value (NULL included —
    groupBy keeps a NULL group, so no null-safe join gymnastics)."""
    viol_cnt = F.count(F.when(F.col("_rec") == "v", F.lit(1))).alias("violations")
    rows_cnt = F.max(F.when(F.col("_rec") == "s", F.col("_rows"))).alias("rows")
    if carry:
        verdicts = report.groupBy(partition_col).agg(rows_cnt, viol_cnt)
    else:
        verdicts = report.agg(rows_cnt, viol_cnt)
    return verdicts.withColumn(
        "verdict", F.when(F.col("violations") > 0, "fail").otherwise("pass")
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

"""Referential checks against dimension tables — the distributed analog of
goskema's context rules (reference dsl/object_typed_builder.go:57-83,
example examples/context_order_inventory): a field value must exist in an
external reference set; a job-level failure to load the dimension maps to
`dependency_unavailable` (reference errors.go:35).

Scale design: dimensions (source registries, license tables, vocab sets)
are small; the check is a LEFT ANTI broadcast join — no shuffle of the
fact side at all. The corpus keeps its partitioning; each task streams
its partition against the broadcast hash set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from goskema_spark.issues import Codes, pointer
from goskema_spark.rowpass import violation


def referential_violations(df: DataFrame, column: str, dim: DataFrame,
                           dim_column: str, row_id: Column,
                           code: str = Codes.INVALID_ENUM, carry=()) -> DataFrame:
    """Rows whose `column` value is absent from dim[dim_column] ->
    violation rows at /<column> with params {"got": value}.

    Null values are NOT referential misses (they are `required` issues,
    handled by the row pass), mirroring the reference where context rules
    run only on present values (presence gating, domain_types.go:25-34).
    """
    dimset = dim.select(F.col(dim_column).alias(column)).distinct()
    misses = (
        df.filter(F.col(column).isNotNull())
        .join(F.broadcast(dimset), column, "left_anti")
    )
    viol = violation(pointer(column), code, rule=f"ref_{column}",
                     params={"got": F.col(column)})
    return misses.select(row_id.alias("row_id"), viol.alias("v"),
                         *[F.col(c) for c in carry]) \
        .select("row_id", "v.path", "v.code", "v.message", "v.rule", "v.params", *carry)


def referential_ok(df: DataFrame, column: str, dim: DataFrame, dim_column: str) -> DataFrame:
    """Complement: rows passing the referential check (left semi)."""
    dimset = dim.select(F.col(dim_column).alias(column)).distinct()
    return df.join(F.broadcast(dimset), column, "left_semi")

"""Run ledger + checkpoint/resume (north rule: "resumable from checkpoint
with per-partition lineage + metrics written to a ledger table").

The reference has no analog (it is a single-call library); the design
follows FIXTURES.md F4:

  ledger row: run_id, partition_id, source, rows, violations, verdict,
              checks map<string,string>, started_at, finished_at
  (partition_id = xxhash64 of the partition key — deterministic from the
  source VALUE, so it is identical across batches, resumes, and cluster
  sizes; ledger identity remains the source column itself)

Format note: this is ledger format v2 (partition_id bigint). A v1
ledger directory (int32 per-invocation dense ranks) must be migrated
ONCE before appending — mixed int32/int64 parquet files in one
directory do not read back:
  spark.read.parquet(v1).withColumn("partition_id",
      F.xxhash64(part_key_col("source"))).write.parquet(v2)

Protocol:
  - logical partitions = distinct values of the partition column
    (`source`): stable across cluster sizes and re-planning, unlike
    spark_partition_id().
  - a partition is COMPLETE once its ledger row is durably written
    (parquet append of one file per batch, atomic enough for a
    single-writer run; Iceberg commits would make this transactional on
    a real lakehouse).
  - resume: re-running with the same run_id loads the ledger, skips
    completed partitions via partition-pruned scan (filter on the
    partition column — pushed down to the reader), validates only the
    remainder, and appends their ledger rows. The final ledger is
    identical to an uninterrupted run (idempotence test in
    tests/test_ledger.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from goskema_spark.issues import pointer
from goskema_spark.runner import ValidationResult, validate

LEDGER_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("partition_id", T.LongType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("rows", T.LongType(), True),
    T.StructField("violations", T.LongType(), True),
    T.StructField("verdict", T.StringType(), True),
    T.StructField("checks", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("started_at", T.TimestampType(), True),
    T.StructField("finished_at", T.TimestampType(), True),
])

# Violations land in part_key=<dir> partitions. Real values get a "v_"
# prefix and NULL gets its own token, so NO real partition value can
# collide with the NULL slot (a literal "__NULL__" source becomes
# "v___NULL__"). Spark URL-escapes unsafe chars in partition dir names.
_NULL_KEY = "__NULL__"


def part_key_col(partition_col: str) -> F.Column:
    return F.when(F.col(partition_col).isNull(), _NULL_KEY).otherwise(
        F.concat(F.lit("v_"), F.col(partition_col)))


def completed_partitions(spark: SparkSession, ledger_path: str, run_id: str):
    """Partitions already ledgered under run_id -> (values, null_done).
    NULL membership is tracked out-of-band as a boolean, never as a
    sentinel string that a real partition value could collide with.
    The existence probe goes through the Spark reader (AnalysisException
    on a missing path), not the driver's local filesystem, so s3://... /
    hdfs://... ledger paths resume correctly on a real cluster."""
    try:
        led = spark.read.parquet(ledger_path)
    except AnalysisException:
        return set(), False
    # v1 guard: appending int64 partition_id files into an int32 (v1)
    # directory would write mixed-type parquet that fails on read-back —
    # refuse up front with the migration recipe (module docstring)
    pid = next((f for f in led.schema.fields
                if f.name == "partition_id"), None)
    if pid is not None and not isinstance(pid.dataType, T.LongType):
        raise ValueError(
            f"ledger at {ledger_path} is format v1 (partition_id "
            f"{pid.dataType.simpleString()}); migrate it to v2 (bigint "
            "partition_id, see goskema_spark.ledger module docstring) "
            "before appending")
    led = led.filter(F.col("run_id") == run_id)
    vals = {r["source"] for r in led.select("source").distinct().collect()}
    null_done = None in vals
    vals.discard(None)
    return vals, null_done


def run_with_ledger(
    spark: SparkSession,
    df: DataFrame,
    schema,
    row_id,
    run_id: str,
    ledger_path: str,
    violations_path: Optional[str] = None,
    dims: Optional[dict] = None,
    partition_col: str = "source",
    fail_partition_limit: int = 0,
    report_path: Optional[str] = None,
) -> Optional[ValidationResult]:
    """Validate `df`, skipping partitions already completed under this
    run_id. `fail_partition_limit` > 0 stops after writing that many
    partition batches (test hook simulating a mid-run crash).

    report_path: scratch parquet location for the one-job report
    materialization (defaults to a dir next to the ledger) — the
    violations write and the ledger rows are then column-pruned reads of
    one materialized relation instead of two full recomputations of the
    pipeline.

    Returns the ValidationResult for the partitions processed in THIS
    invocation (None if everything was already complete).
    """
    full_df = df  # uniqueness scope: the global table, never the pruned subset
    if report_path is None:
        report_path = f"{ledger_path.rstrip('/')}__report/run_id={run_id}"
    done, null_done = completed_partitions(spark, ledger_path, run_id)
    if done or null_done:
        cond = ~F.col(partition_col).isin(list(done)) if done else F.lit(True)
        if null_done:
            cond = cond & F.col(partition_col).isNotNull()
        else:
            cond = cond | F.col(partition_col).isNull()
        df = df.filter(cond)  # partition-pruned re-scan

    if fail_partition_limit:
        # test hook only: needs the explicit partition list
        remaining = [r[0] for r in df.select(partition_col).distinct().collect()]
        if not remaining:
            return None
        keep = sorted((s for s in remaining if s is not None))[:fail_partition_limit]
        cond = F.col(partition_col).isin(keep)
        if None in remaining and len(keep) < fail_partition_limit:
            # the NULL partition fills the remaining quota — isin([])
            # alone would starve it forever once it is the only one left
            # (empty batch every resume, never ledgered, never done)
            cond = cond | F.col(partition_col).isNull()
        df = df.filter(cond)
    elif not df.select(partition_col).take(1):
        # emptiness probe, not a distinct-collect: partition_col may be
        # higher-cardinality than the ledger protocol expects (it should
        # be a low-cardinality logical partition like `source`), and
        # take(1) stops at the first row
        return None

    # driver-side wall clock, NOT F.current_timestamp(): the latter is
    # evaluated once per QUERY, and both timestamp columns land in the
    # same ledger-write query — started_at would always equal
    # finished_at, erasing the run duration the lineage row exists for
    import datetime as _dt
    started = F.lit(_dt.datetime.now(_dt.timezone.utc))
    res = validate(df, schema, row_id, dims=dims, partition_col=partition_col,
                   uniqueness_scope=full_df, report_path=report_path)

    if violations_path:
        # Idempotent under crash-resume: violations land in
        # (run_id, partition) directories with DYNAMIC partition
        # overwrite, so a partition re-validated after a crash between
        # the violations write and the ledger write REPLACES its rows
        # instead of appending duplicates.
        (res.violations
         .withColumn("run_id", F.lit(run_id))
         .withColumn("params", F.to_json("params"))
         .withColumn("part_key", part_key_col(partition_col))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("run_id", "part_key")
         .parquet(violations_path))

    # Per-check verdicts derived from each check's OWN violation class —
    # a partition failing only rowpass must report unique_*: pass, not
    # inherit the overall verdict (VERDICT r4 #2). Classes: uniqueness
    # rows carry rule='unique_by' at the key's pointer path; referential
    # rows carry rule='ref_<col>'; everything else is the row pass.
    agg_checks = (
        [(f"unique_{u.column}",
          (F.col("rule") == "unique_by")
          & (F.col("path") == pointer(u.column)))
         for u in schema.unique_keys]
        + [(f"ref_{k.column}", F.col("rule") == f"ref_{k.column}")
           for k in schema.foreign_keys])
    agg_any = None
    for _, cond in agg_checks:
        agg_any = cond if agg_any is None else (agg_any | cond)
    rowpass_cond = ~agg_any if agg_any is not None else F.lit(True)
    check_conds = [("rowpass", rowpass_cond)] + agg_checks
    # one tiny grouped aggregate over the (column-pruned, materialized)
    # violations relation; joined back on the partition VALUE null-safely
    per_check = (res.violations
                 .groupBy(F.col(partition_col).alias("_ck_part"))
                 .agg(*[F.count(F.when(cond, F.lit(1))).alias(f"_ck_{i}")
                        for i, (_, cond) in enumerate(check_conds)]))
    checks = F.map_from_arrays(
        F.array(*[F.lit(name) for name, _ in check_conds]),
        F.array(*[F.when(F.coalesce(F.col(f"_ck_{i}"), F.lit(0)) > 0,
                         "fail").otherwise("pass")
                  for i in range(len(check_conds))]),
    )
    # partition_id: STABLE across batches and crash-resumes — derived
    # deterministically from the partition VALUE (xxhash64), not from a
    # dense_rank over this invocation's verdicts: a rank restarts at 0 on
    # every resume, so under one run_id the same source could get
    # different ids across batches and two sources could share an id
    # (ADVICE r3). spark_partition_id() stays rejected for the same
    # reason (physical-plan-dependent noise). NULL partitions hash the
    # out-of-band sentinel, collision-free with any real 'v_'-prefixed
    # key (see part_key_col).
    verd = res.verdicts.join(
        per_check,
        F.col(partition_col).eqNullSafe(F.col("_ck_part")), "left")
    ledger_rows = verd.select(
        F.lit(run_id).alias("run_id"),
        F.xxhash64(part_key_col(partition_col)).alias("partition_id"),
        F.col(partition_col).alias("source"),
        F.col("rows").cast("long").alias("rows"),
        F.col("violations").cast("long").alias("violations"),
        F.col("verdict"),
        checks.alias("checks"),
        started.alias("started_at"),
        F.current_timestamp().alias("finished_at"),
    )
    ledger_rows.write.mode("append").parquet(ledger_path)
    return res


def read_ledger(spark: SparkSession, ledger_path: str, run_id: str) -> DataFrame:
    return (spark.read.parquet(ledger_path)
            .filter(F.col("run_id") == run_id))

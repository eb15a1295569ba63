"""Distribution-drift detection on n_tok histograms (north rule):
fixed-width histogram via width_bucket (built-in, single hash aggregate),
then PSI (population stability index) and a two-sample KS statistic
computed ON THE DRIVER from the two (tiny) histograms.

The scale story: the only distributed work is one groupBy over the
bucket id — partial+final hash agg, k buckets out regardless of input
size. The statistics are O(k) driver-side arithmetic.

Semantics anchor: this is the aggregate analog of goskema's
`aggregate_violation` code (reference errors.go:31) — a dataset-level
rule violation rather than a per-row one.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from goskema_spark.issues import Codes

DEFAULT_BUCKETS = 16


def histogram(df: DataFrame, column: str, lo: float, hi: float,
              buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Equal-width histogram: (bucket, bucket_lo, bucket_hi, cnt).
    Bucket 0 catches < lo, bucket `buckets+1` catches >= hi
    (width_bucket semantics); null AND NaN values are dropped — NaN
    width_buckets to NULL, and a NULL bucket key never matches in the
    PSI/KS full-outer join, so keeping it would distort both sides'
    distributions (each side's NaN row would count in the total but in
    no bucket)."""
    width = (hi - lo) / buckets
    # try_cast + isNotNull on the CAST value, mirroring drift_stream:
    # a non-numeric string must drop here, not crash the job (ANSI) or
    # survive as a NULL-bucket row that inflates the totals (non-ANSI,
    # where isnan(NULL) is false)
    cd = F.col(column).try_cast("double")
    b = F.width_bucket(cd, F.lit(float(lo)), F.lit(float(hi)), F.lit(buckets))
    return (
        df.filter(cd.isNotNull() & ~F.isnan(cd))
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bucket_lo", (F.lit(lo) + (F.col("bucket") - 1) * F.lit(width)).cast("double"))
        .withColumn("bucket_hi", (F.lit(lo) + F.col("bucket") * F.lit(width)).cast("double"))
        .select("bucket", "bucket_lo", "bucket_hi", "cnt")
    )


def _normalize(hist: dict, buckets: int, eps: float = 1e-6) -> list:
    total = sum(hist.values()) or 1
    # buckets 0..buckets+1 (underflow/overflow included)
    return [max(hist.get(i, 0) / total, eps) for i in range(0, buckets + 2)]


def psi(cur_hist: dict, ref_hist: dict, buckets: int = DEFAULT_BUCKETS) -> float:
    """Population Stability Index: sum((p - q) * ln(p / q)). Rule of thumb:
    < 0.1 stable, 0.1-0.25 moderate, > 0.25 drifted."""
    p = _normalize(cur_hist, buckets)
    q = _normalize(ref_hist, buckets)
    return float(sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q)))


def ks_statistic(cur_hist: dict, ref_hist: dict, buckets: int = DEFAULT_BUCKETS) -> float:
    """Two-sample KS statistic on binned data: max |CDF_p - CDF_q|."""
    p = _normalize(cur_hist, buckets)
    q = _normalize(ref_hist, buckets)
    sp = sq = 0.0
    tp, tq = sum(p), sum(q)
    d = 0.0
    for pi, qi in zip(p, q):
        sp += pi / tp
        sq += qi / tq
        d = max(d, abs(sp - sq))
    return float(d)


def psi_ks_between(df_a: DataFrame, df_b: DataFrame, column: str,
                   lo: float, hi: float, buckets: int = DEFAULT_BUCKETS,
                   eps: float = 1e-6) -> DataFrame:
    """Fully-distributed PSI + KS between two datasets' histograms of
    `column` — one row out. Unlike drift_check (driver-side arithmetic on
    a collected histogram), this stays in Spark end-to-end, so it can run
    inside a larger pipeline and be oracle-checked.

    Buckets absent from both sides contribute 0 to both statistics, so
    only the union of observed buckets is materialized.
    """
    ha = histogram(df_a, column, lo, hi, buckets).select("bucket", F.col("cnt").alias("cnt_a"))
    hb = histogram(df_b, column, lo, hi, buckets).select("bucket", F.col("cnt").alias("cnt_b"))
    joined = ha.join(hb, "bucket", "full").select(
        "bucket",
        F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
    )
    tot = joined.agg(F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb"))
    j = joined.crossJoin(F.broadcast(tot))
    # zero-total guard (mirrors score_grouped_histograms' ta>0 & tb>0
    # gate): an empty side's shares degrade to 0 -> eps, reporting total
    # drift, instead of DIVIDE_BY_ZERO under ANSI or an all-NULL ks that
    # masks the drift entirely under non-ANSI
    share = lambda c, t: F.when(F.col(t) > 0,  # noqa: E731
                                F.col(c) / F.col(t)).otherwise(F.lit(0.0))
    p = F.greatest(share("cnt_a", "ta"), F.lit(eps))
    q = F.greatest(share("cnt_b", "tb"), F.lit(eps))
    from pyspark.sql import Window
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf = lambda c, t: F.when(F.col(t) > 0,  # noqa: E731
                              F.sum(F.col(c)).over(w) / F.col(t)) \
        .otherwise(F.lit(0.0))
    scored = j.select(
        "bucket",
        ((p - q) * F.log(p / q)).alias("psi_term"),
        (cdf("cnt_a", "ta") - cdf("cnt_b", "tb")).alias("cdf_diff"),
    )
    return scored.agg(
        F.round(F.sum("psi_term"), 6).alias("psi"),
        F.round(F.max(F.abs(F.col("cdf_diff"))), 6).alias("ks"),
    )


def score_grouped_histograms(ha: DataFrame, hb: DataFrame,
                             group_col: str = "g",
                             eps: float = 1e-6) -> DataFrame:
    """PSI + KS per group from two PREBUILT histograms:
    ha(group_col, bucket, cnt_a) vs hb(group_col, bucket, cnt_b) ->
    (group_col, psi, ks). One row per group present with rows on BOTH
    sides; a group with no reference (or no current) distribution has
    nothing to compare against and is omitted rather than reported as a
    fake zero. Shared scoring tail of psi_ks_by_group / windowed_drift /
    the streaming drift operator — the math is oracle-proven once and
    reused.

    Scale story: inputs are G x (buckets+2) rows regardless of corpus
    size; a full-outer join per group on the bucket axis, per-group
    totals joined back, and a window over <= buckets+2 rows per group
    for the CDF. Nothing is collected.
    """
    joined = (ha.join(hb, [group_col, "bucket"], "full")
              .select(group_col, "bucket",
                      F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                      F.coalesce("cnt_b", F.lit(0)).alias("cnt_b")))
    tot = (joined.groupBy(group_col)
           .agg(F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb"))
           .filter((F.col("ta") > 0) & (F.col("tb") > 0)))
    j = joined.join(tot, group_col)
    p = F.greatest(F.col("cnt_a") / F.col("ta"), F.lit(eps))
    q = F.greatest(F.col("cnt_b") / F.col("tb"), F.lit(eps))
    from pyspark.sql import Window
    w = (Window.partitionBy(group_col).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    scored = j.select(
        group_col,
        ((p - q) * F.log(p / q)).alias("psi_term"),
        (F.sum(F.col("cnt_a")).over(w) / F.col("ta")
         - F.sum(F.col("cnt_b")).over(w) / F.col("tb")).alias("cdf_diff"),
    )
    return (scored.groupBy(group_col)
            .agg(F.round(F.sum("psi_term"), 6).alias("psi"),
                 F.round(F.max(F.abs(F.col("cdf_diff"))), 6).alias("ks")))


def grouped_histogram(df: DataFrame, column: str, group_expr,
                      lo: float, hi: float,
                      buckets: int = DEFAULT_BUCKETS,
                      cnt_name: str = "cnt_a",
                      group_name: str = "g") -> DataFrame:
    """(group, bucket, cnt) histogram — the per-group analog of
    histogram(). `group_expr` may be a column name or a Column (e.g. a
    window start). Null/NaN values dropped as in histogram()."""
    ge = F.col(group_expr) if isinstance(group_expr, str) else group_expr
    cd = F.col(column).try_cast("double")  # see histogram(): ANSI-safe
    b = F.width_bucket(cd, F.lit(float(lo)), F.lit(float(hi)),
                       F.lit(buckets))
    return (df.filter(cd.isNotNull() & ~F.isnan(cd))
            .groupBy(ge.alias(group_name), b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias(cnt_name)))


def psi_ks_by_group(df_a: DataFrame, df_b: DataFrame, column: str,
                    group_col: str, lo: float, hi: float,
                    buckets: int = DEFAULT_BUCKETS,
                    eps: float = 1e-6) -> DataFrame:
    """Per-group PSI + KS — the per-partition-lineage form of the drift
    check (north rule: drift per source, not just globally). One row per
    group present in BOTH sides. Two (group, bucket) hash aggregates
    feeding score_grouped_histograms (see there for the scale story)."""
    ha = grouped_histogram(df_a, column, group_col, lo, hi, buckets,
                           "cnt_a", group_col)
    hb = grouped_histogram(df_b, column, group_col, lo, hi, buckets,
                           "cnt_b", group_col)
    return score_grouped_histograms(ha, hb, group_col, eps)


def windowed_drift(df: DataFrame, column: str, ref: DataFrame,
                   lo: float, hi: float, buckets: int = DEFAULT_BUCKETS,
                   ts_col: str = "ts", window: str = "1 hour",
                   eps: float = 1e-6) -> DataFrame:
    """Per-time-window PSI + KS of `column` against a FIXED reference
    snapshot: (window_start, psi, ks), one row per tumbling window that
    has any in-range rows. The batch twin of the streaming drift
    operator (streaming.drift_stream) — both score the same grouped
    histograms, so the stream can be cross-validated against this.

    Scale story: one (window, bucket) hash aggregate over the corpus
    (W x (buckets+2) rows out), one bucket aggregate over the reference,
    reference histogram broadcast-crossed to the observed windows (tiny
    x tiny), then score_grouped_histograms. Nothing is collected.
    """
    ws = F.window(F.col(ts_col).cast("timestamp"), window)["start"]
    ha = grouped_histogram(df, column, ws, lo, hi, buckets,
                           "cnt_a", "window_start")
    ref_hist = (histogram(ref, column, lo, hi, buckets)
                .select("bucket", F.col("cnt").alias("cnt_b")))
    wins = ha.select("window_start").distinct()
    hb = wins.crossJoin(F.broadcast(ref_hist))
    return score_grouped_histograms(ha, hb, "window_start", eps)


def drift_check(df: DataFrame, column: str, ref: DataFrame, lo: float, hi: float,
                buckets: int = DEFAULT_BUCKETS, psi_threshold: float = 0.25,
                ks_threshold: float = 0.30) -> dict:
    """Compare df[column]'s histogram against a reference snapshot
    (schema: bucket|bucket_lo, cnt). Returns a verdict dict; `code`
    is `aggregate_violation` when drifted (FIXTURES.md F3 contract)."""
    cur = {r["bucket"]: r["cnt"] for r in histogram(df, column, lo, hi, buckets).collect()}
    ref_rows = ref.collect()
    if ref_rows and "bucket" in ref_rows[0].asDict():
        refh = {r["bucket"]: r["cnt"] for r in ref_rows}
    else:  # FIXTURES F3 shape: bucket_lo/bucket_hi/cnt
        width = (hi - lo) / buckets
        refh = {int(round((r["bucket_lo"] - lo) / width)) + 1: r["cnt"] for r in ref_rows}
    p = psi(cur, refh, buckets)
    k = ks_statistic(cur, refh, buckets)
    drifted = p > psi_threshold or k > ks_threshold
    return {
        "check": f"drift_{column}",
        "psi": p,
        "ks": k,
        "psi_threshold": psi_threshold,
        "ks_threshold": ks_threshold,
        "verdict": "fail" if drifted else "pass",
        "code": Codes.AGGREGATE_VIOLATION if drifted else None,
    }

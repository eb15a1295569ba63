"""Deterministic sampling / per-group quota / sessionization ops.

Strategy mirrors the other op suites: determinism and exactness
properties (same seed -> same subset; salted two-phase == unsalted
window) plus a cross-validation of the portable sessionize derivation
against Spark's NATIVE session_window operator, including the exact
gap-boundary semantics."""

import datetime

from pyspark.sql import functions as F, types as T

from goskema_spark.ops.sample import (
    hash_sample,
    stratified_sample,
    top_k_per_group,
)
from goskema_spark.ops.sessionize import (
    session_window_counts,
    sessionize,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 5).cast("string")).alias("source"),
        (F.xxhash64(F.col("id").cast("string")) % 1000).alias("score"),
    )


def test_hash_sample_deterministic_and_rate(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(df, 0.25, "doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(df, 0.25, "doc_id").collect()}
    assert a == b  # reproducible across runs
    assert 0.18 <= len(a) / 2000 <= 0.32  # md5 uniformity at n=2000
    # monotone in rate: a lower-rate sample is a SUBSET (same hash order)
    c = {r["doc_id"] for r in hash_sample(df, 0.10, "doc_id").collect()}
    assert c <= a
    # different seed -> different (mostly disjoint-ish) subset
    d = {r["doc_id"] for r in hash_sample(df, 0.25, "doc_id", seed="v2").collect()}
    assert d != a


def test_stratified_sample_rates(spark):
    df = _docs(spark)
    out = stratified_sample(df, {"src0": 1.0, "src1": 0.0}, "source",
                            "doc_id", default_rate=0.5)
    rows = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in rows}
    assert by.get("src0") == 400       # rate 1.0 keeps every src0 row
    assert "src1" not in by            # rate 0.0 drops all
    for s in ("src2", "src3", "src4"):
        assert 0.35 <= by[s] / 400 <= 0.65  # default 0.5
    # uniform rates == plain hash_sample (stratification changes only
    # the threshold, never the hash)
    uni = stratified_sample(df, {}, "source", "doc_id", default_rate=0.3)
    plain = hash_sample(df, 0.3, "doc_id")
    assert {r["doc_id"] for r in uni.collect()} == \
        {r["doc_id"] for r in plain.collect()}


def test_stratified_sample_null_stratum(spark):
    """rates may key None for NULL strata (r5 review: None as a map-literal
    key crashes Spark at runtime and sorted() at plan time; it now routes
    through an explicit isNull branch)."""
    df = _docs(spark).withColumn(
        "source", F.when(F.col("source") == "src1", None)
        .otherwise(F.col("source")))
    out = stratified_sample(df, {None: 1.0, "src0": 0.0}, "source",
                            "doc_id", default_rate=0.0)
    rows = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in rows}
    assert by == {None: 400}  # NULL stratum kept in full, others dropped
    # without a None entry, NULL strata fall through to default_rate
    out2 = stratified_sample(df, {"src0": 1.0}, "source", "doc_id",
                             default_rate=0.0)
    assert {r["source"] for r in out2.select("source").distinct().collect()} \
        == {"src0"}


def test_stratified_sample_plan_flat_in_strata(spark):
    """The stratum threshold lookup is one map-literal GetMapValue, not
    a nested CaseWhen chain — expression tree DEPTH must not grow with
    #strata (10^4 strata would blow the codegen recursion limit as a
    chain)."""
    df = _docs(spark)
    big = {f"src{i}": (i % 100) / 100.0 for i in range(10_000)}
    out = stratified_sample(df, big, "source", "doc_id", default_rate=0.0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "CASE WHEN" not in plan
    # still correct: src0 -> 0.0 (dropped), src1 -> 0.01, src50 absent
    # from _docs; compare against the small-dict result for the listed
    # sources present in the data
    small = stratified_sample(df, {s: big[s] for s in
                                   ("src0", "src1", "src2", "src3", "src4")},
                              "source", "doc_id", default_rate=0.0)
    assert {r["doc_id"] for r in out.collect()} == \
        {r["doc_id"] for r in small.collect()}


def test_top_k_per_group_salted_equals_unsalted(spark):
    df = _docs(spark)
    plain = top_k_per_group(df, "source", "score", 3, "doc_id")
    salted = top_k_per_group(df, "source", "score", 3, "doc_id", salt=8)
    key = lambda r: (r["source"], r["rk"], r["doc_id"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))
    counts = plain.groupBy("source").count().collect()
    assert all(r["count"] == 3 for r in counts)
    # rank 1 really is the group maximum
    top1 = {r["source"]: r["score"] for r in plain.filter("rk = 1").collect()}
    mx = {r["source"]: r["mx"] for r in
          df.groupBy("source").agg(F.max("score").alias("mx")).collect()}
    assert top1 == mx


def _events(spark):
    base = datetime.datetime(2025, 1, 1)
    rows = []
    for u in range(3):
        t = base + datetime.timedelta(minutes=10 * u)
        # session 1: 3 events 5 min apart; gap 45 min; session 2: 2 events
        for off in (0, 5, 10, 55, 60):
            rows.append((u, t + datetime.timedelta(minutes=off), 1.0 + u))
    # boundary user: gap EXACTLY 30 min -> ONE session (an event on the
    # previous session's end extends it — native session_window rule)
    # and 31 min -> two sessions
    rows.append((9, base, 0.5))
    rows.append((9, base + datetime.timedelta(minutes=30), 0.5))
    rows.append((8, base, 0.5))
    rows.append((8, base + datetime.timedelta(minutes=31), 0.5))
    return spark.createDataFrame(rows, T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType())]))


def test_sessionize_gap_semantics(spark):
    out = sessionize(_events(spark), gap_seconds=1800)
    per_user = {(r["user_id"], r["session_seq"]): r["n_events"]
                for r in out.collect()}
    for u in range(3):
        assert per_user[(u, 0)] == 3 and per_user[(u, 1)] == 2
    # exact-gap boundary: 30:00 apart merges; 31:00 apart splits
    assert per_user[(9, 0)] == 2 and (9, 1) not in per_user
    assert per_user[(8, 0)] == 1 and per_user[(8, 1)] == 1


def test_sessionize_matches_native_session_window(spark):
    """The portable lag+cumsum derivation and Spark's native
    session_window must produce identical sessions (start, end, counts,
    sums) — the batch oracle path and the streaming-native path agree."""
    ev = _events(spark)
    ours = {(r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], r["sum_value"])
            for r in sessionize(ev, gap_seconds=1800).collect()}
    native = {(r["user_id"], r["session_start"], r["session_end"],
               r["n_events"], r["sum_value"])
              for r in session_window_counts(ev, gap="30 minutes").collect()}
    assert ours == native


def test_pps_systematic_exact_and_proportional(spark):
    from goskema_spark.ops.sample import pps_systematic
    rows = [(f"s{i % 3}", i, ("w " * (i % 40)).strip() or None)
            for i in range(300)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    step = 37

    # token_count_ws = size(split(text, ' ')): single-space split, NULL -> 0
    def ntok(t):
        return 0 if t is None else len(t.split(" "))

    got = {(r["source"], r["doc_id"]) for r in
           pps_systematic(df, step, num_parts=5).collect()}
    # brute force on the same total order
    ordered = sorted(rows, key=lambda r: (r[0], r[1]))
    off, want = 0, set()
    for s, d, t in ordered:
        n = ntok(t)
        r = off % step
        if n > 0 and (r == 0 or r + n - 1 >= step):
            want.add((s, d))
        off += n
    assert got == want
    # expected size = total_tokens / step (within rounding slack)
    total = sum(ntok(t) for _, _, t in rows)
    assert abs(len(got) - total / step) <= len(got) * 0.1 + 2
    # null-text (zero-token) docs are never selected
    z = spark.createDataFrame([("a", 1, None), ("a", 2, None)],
                              "source string, doc_id long, text string")
    assert pps_systematic(z, 5).count() == 0

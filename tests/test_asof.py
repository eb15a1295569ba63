"""as-of join + range join: correctness vs a brute-force reference on
synthetic data, bucketed-variant equivalence (including across-bucket
carry), direction/tolerance/how options, and a no-cartesian plan gate.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from goskema_spark.ops.asof import (asof_join, asof_join_bucketed,
                                    range_join_count)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(
            [("a", 5), ("a", 10), ("a", 61), ("b", 3), ("b", 200),
             ("c", 50),          # key with no right rows at all
             ("a", 10)])],       # duplicate left ts
        "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(100, "a", _ts(0), 1.0), (101, "a", _ts(10), 2.0),
         (102, "a", _ts(60), 3.0), (103, "b", _ts(4), 4.0),
         (104, "d", _ts(1), 9.0)],
        "rid long, k string, ts timestamp, val double")
    return left, right


def _brute(left_rows, right_rows, direction="backward", tol=None):
    out = {}
    for lid, k, lts in left_rows:
        cands = []
        for rid, rk, rts, val in right_rows:
            if rk != k:
                continue
            d = (lts - rts).total_seconds() if direction == "backward" \
                else (rts - lts).total_seconds()
            if d >= 0 and (tol is None or d * 1e6 <= tol):
                cands.append((rts, rid, val))
        if cands:
            best = max(cands) if direction == "backward" else min(cands)
            out[lid] = (best[0], best[1], best[2])
        else:
            out[lid] = None
    return out


def _collect(df):
    return {r["lid"]: (None if r["matched_ts"] is None
                       else (r["matched_ts"], r["rid"], r["val"]))
            for r in df.collect()}


def test_backward_matches_brute(spark, sides):
    left, right = sides
    got = _collect(asof_join(left, right, on=["k"]))
    want = _brute([tuple(r) for r in left.collect()],
                  [tuple(r) for r in right.collect()])
    # every left lid present (no rows dropped), every match correct
    assert set(got) == set(want)
    assert got == want
    # inclusive boundary: left at minute 10 matches right at minute 10
    assert got[1][1] == 101


def test_forward_and_tolerance(spark, sides):
    left, right = sides
    fwd = _collect(asof_join(left, right, on=["k"], direction="forward"))
    want = _brute([tuple(r) for r in left.collect()],
                  [tuple(r) for r in right.collect()], direction="forward")
    assert set(fwd) == set(want)
    assert fwd == want
    # tolerance 2 minutes: left minute 61 -> right minute 60 ok (1m),
    # left minute 5 -> right minute 0 dropped (5m)
    tol = _collect(asof_join(left, right, on=["k"],
                             tolerance_us=2 * 60 * 1_000_000))
    assert tol[2] is not None and tol[0] is None


def test_inner_drops_unmatched(spark, sides):
    left, right = sides
    inner = asof_join(left, right, on=["k"], how="inner")
    # lid 3 = (b, minute 3) precedes the only b right row (minute 4);
    # lid 5 = key c has no right rows -- both drop under 'inner'
    assert {r["lid"] for r in inner.collect()} == {0, 1, 2, 4, 6}


def test_bucketed_equals_plain(spark, sides):
    left, right = sides
    plain = _collect(asof_join(left, right, on=["k"]))
    # 30-minute buckets: the (a, 61) left row's match (a, 60) sits one
    # bucket back ONLY via in-bucket max; the (b, 200) row's match
    # (b, 4) is SIX empty buckets back -> exercises the carry join
    bucketed = _collect(asof_join_bucketed(
        left, right, on=["k"], bucket_us=30 * 60 * 1_000_000))
    assert bucketed == plain
    # tiny bucket width (1 min) degenerates to almost one row per
    # bucket -- pure carry path
    tiny = _collect(asof_join_bucketed(
        left, right, on=["k"], bucket_us=60 * 1_000_000))
    assert tiny == plain


def test_bucketed_equals_plain_randomized(spark):
    import random
    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, rng.choice("xyz"), _ts(rng.randint(0, 500)))
         for i in range(200)], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(1000 + i, rng.choice("xyz"), _ts(rng.randint(0, 500)),
          float(i)) for i in range(80)],
        "rid long, k string, ts timestamp, val double")
    plain = _collect(asof_join(left, right, on=["k"]))
    bucketed = _collect(asof_join_bucketed(
        left, right, on=["k"], bucket_us=45 * 60 * 1_000_000))
    assert bucketed == plain and len(plain) == 200


def test_no_cartesian_in_plans(spark, sides):
    left, right = sides
    for df in (asof_join(left, right, on=["k"]),
               range_join_count(left, right, on=["k"])):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_count_vs_brute(spark, sides):
    left, right = sides
    # window [0, +30min]
    got = {r["lid"]: r["n_in_range"]
           for r in range_join_count(left, right, on=["k"], lo_us=0,
                                     hi_us=30 * 60 * 1_000_000).collect()}
    lrows = [tuple(r) for r in left.collect()]
    rrows = [tuple(r) for r in right.collect()]
    for lid, k, lts in lrows:
        n = sum(1 for (_, rk, rts, _) in rrows
                if rk == k and lts <= rts <= lts + dt.timedelta(minutes=30))
        assert got[lid] == n, (lid, got[lid], n)


def test_range_join_negative_lo(spark, sides):
    left, right = sides
    # symmetric window [-10min, +10min]
    got = {r["lid"]: r["n_in_range"]
           for r in range_join_count(
               left, right, on=["k"], lo_us=-10 * 60 * 1_000_000,
               hi_us=10 * 60 * 1_000_000).collect()}
    lrows = [tuple(r) for r in left.collect()]
    rrows = [tuple(r) for r in right.collect()]
    for lid, k, lts in lrows:
        n = sum(1 for (_, rk, rts, _) in rrows
                if rk == k and abs((rts - lts).total_seconds()) <= 600)
        assert got[lid] == n, (lid, got[lid], n)


def test_arg_guards(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], direction="nearest")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, on=["k"], how="outer")
    with pytest.raises(ValueError, match="collide"):
        # right payload column 'lid' collides with a left column
        asof_join(left, right.withColumnRenamed("val", "lid"), on=["k"])
    with pytest.raises(ValueError, match="hi_us > lo_us"):
        range_join_count(left, right, on=["k"], lo_us=10, hi_us=10)


def test_null_keys_and_null_right_ts(spark):
    """SQL semantics: NULL keys never match (plain ≡ bucketed), and a
    right row with NULL ts neither matches nor leaks payload."""
    left = spark.createDataFrame(
        [(0, None, _ts(10)), (1, "a", _ts(10))],
        "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(100, None, _ts(5), 7.0),     # NULL key: must never match
         (101, "a", None, 9.0),        # NULL ts: no position on axis
         (102, "a", _ts(3), 1.0)],
        "rid long, k string, ts timestamp, val double")
    for fn, kw in ((asof_join, {}),
                   (asof_join_bucketed, {"bucket_us": 60_000_000})):
        rows = {r["lid"]: r for r in
                fn(left, right, on=["k"], **kw).collect()}
        assert rows[0]["matched_ts"] is None and rows[0]["val"] is None
        # the NULL-ts right row must not shadow the real match
        assert rows[1]["rid"] == 102 and rows[1]["val"] == 1.0


def test_reserved_column_guard(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="internal working"):
        asof_join(left.withColumn("_t", F.lit(1)), right, on=["k"])
    with pytest.raises(ValueError, match="internal working"):
        range_join_count(left, right.withColumn("_b", F.lit(1)), on=["k"])
    with pytest.raises(ValueError, match="count_col"):
        range_join_count(left.withColumn("n_in_range", F.lit(1)),
                         right, on=["k"])


def test_asof_output_name_collisions_rejected(spark):
    """r5 review: payload names must be distinct from each other AND
    from right_ts_out — otherwise the join emits duplicate-named
    columns that break any downstream select or parquet write."""
    left = spark.createDataFrame([("k", "2024-01-01 00:00:05")],
                                 "k string, ts string")
    right = spark.createDataFrame([("k", "2024-01-01 00:00:01", 1.0)],
                                  "k string, ts string, price double")
    with pytest.raises(ValueError, match="payload"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                  payload=["price", "price"])
    with pytest.raises(ValueError, match="right_ts_out"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                  payload=["price"], right_ts_out="price")

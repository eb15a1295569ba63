"""As-of join and range join — time-series operators Spark's built-in
join strategies do not provide. The reference engine has no joins at all
(SURVEY §2.3: it is a per-document validator); these belong to the
table-scale dataflow surface the north rule adds, and they are the two
classic "Spark lacks it, pipelines need it" operators (feature lookup at
event time, point-in-time-correct training joins, windowed context
retrieval).

as-of semantics (DuckDB/pandas `merge_asof` compatible, oracle-checked
against DuckDB's native ASOF JOIN):
  backward: each left row matches the right row with the LARGEST
            right_ts <= left_ts for the same key (inclusive).
  forward:  smallest right_ts >= left_ts.

Scale design — NOT a sort-merge over an exploded inequality join:

  plain `asof_join`: union the two sides tagged, ONE sort-shuffle
  partitioned by key ordered by (ts, side), and a running MAX over a
  struct (right_ts, payload...) recovers the latest-preceding right row
  for every left row in a single pass. Cost = sort of |L|+|R| rows by
  key — the same shape as any per-key window; no row multiplication,
  no range explosion. Struct-max (not last(ignoreNulls)) makes ties on
  right_ts deterministic: lexicographic struct order picks one winner
  bit-identically on every engine.

  `asof_join_bucketed`: the hot-key escape hatch. A window partitioned
  only by key serializes each key into one task — fine for user-keyed
  events, a serial tail when one key holds 10^9 rows. Bucketing by
  (key, floor(ts / bucket)) splits a key's timeline across many tasks;
  a per-(key, bucket) max-struct aggregate (tiny: one row per non-empty
  bucket) is itself as-of-joined back as each bucket's carry-in, so
  matches crossing bucket boundaries stay exact. Tested equal to the
  plain variant on every row.

range join `range_join_count`: right rows with right_ts in
[left_ts + lo, left_ts + hi] per key. Implemented as an equi-join on
(key, time_bucket) with the left side exploded to the <= 2 candidate
buckets that can overlap its interval (bucket width >= hi - lo), then
the exact range predicate — never a raw inequality join, which Spark
plans as BroadcastNestedLoop/cartesian. Join fan-out is bounded by
actual temporal locality, not |L| x |R|.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

_MATCH = "_gsk_asof"


_RESERVED = {"_t", "_side", "_b", "_lt", "_rt", "_hit",
             "_local", "_carry", "_bm", _MATCH}


def _check_reserved(*dfs: DataFrame) -> None:
    used = set().union(*(df.columns for df in dfs)) & _RESERVED
    if used:
        raise ValueError(
            f"input columns {sorted(used)} collide with internal working "
            "columns of the as-of/range join; rename them first")


def _check_args(left: DataFrame, right: DataFrame, payload, direction: str,
                how: str, right_ts_out: str) -> None:
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    clash = ({right_ts_out} | set(payload)) & set(left.columns)
    if clash:
        raise ValueError(
            f"output columns {sorted(clash)} collide with left columns; "
            "rename via payload aliases or right_ts_out")
    # the output columns must also be distinct from EACH OTHER —
    # payload containing right_ts_out (or a repeated payload name)
    # would emit a duplicate-named column that breaks any downstream
    # select or parquet write
    if len(payload) != len(set(payload)):
        raise ValueError("payload contains duplicate column names")
    if right_ts_out in payload:
        raise ValueError(
            f"right_ts_out {right_ts_out!r} also appears in payload; "
            "rename one of them")
    _check_reserved(left, right)


def _prep(left: DataFrame, right: DataFrame, on: Sequence[str],
          left_ts: str, right_ts: str, payload: Sequence[str],
          direction: str):
    """Tagged union: left rows carry their full row; right rows carry
    only (key, ts, match-struct). For `forward` the time axis is
    negated (integer microseconds) so one running-max implementation
    serves both directions."""
    sign = -1 if direction == "forward" else 1
    axis = lambda c: (F.unix_micros(F.col(c).cast("timestamp")) * sign)  # noqa: E731
    match = F.struct(
        axis(right_ts).alias("_axis"),
        F.col(right_ts).cast("timestamp").alias("_mts"),
        *[F.col(p).alias(p) for p in payload],
    )
    l_cols = left.columns
    lu = left.select(
        *l_cols,
        axis(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(match.alias(_MATCH)).schema[_MATCH].dataType
        ).alias(_MATCH),
    )
    # SQL join semantics: a NULL key never matches (NULL = NULL is not
    # true), and a NULL right_ts row has no position on the time axis —
    # drop both from the right side. A left row with a NULL key then
    # simply finds no right rows in its partition and stays unmatched.
    null_free = F.col(right_ts).isNotNull()
    for k in on:
        null_free = null_free & F.col(k).isNotNull()
    right = right.filter(null_free)
    ru = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in l_cols if c not in on],
        *[F.col(k).alias(k) for k in on],
        axis(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        match.alias(_MATCH),
    ).select(*l_cols, "_t", "_side", _MATCH)
    return lu.unionByName(ru)


def _finish(matched: DataFrame, left_cols, payload, tolerance_us, how: str,
            right_ts_out: str) -> DataFrame:
    m = F.col(_MATCH)
    ok = m.isNotNull()
    if tolerance_us is not None:
        # _axis is sign-adjusted so left _t - right _axis >= 0 always
        ok = ok & ((F.col("_t") - m["_axis"]) <= F.lit(int(tolerance_us)))
    out = matched.select(
        *left_cols,
        F.when(ok, m["_mts"]).alias(right_ts_out),
        *[F.when(ok, m[p]).alias(p) for p in payload],
    )
    if how == "inner":
        out = out.filter(F.col(right_ts_out).isNotNull())
    return out


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: Optional[str] = None,
              payload: Optional[Sequence[str]] = None,
              direction: str = "backward",
              tolerance_us: Optional[int] = None,
              how: str = "left",
              right_ts_out: str = "matched_ts") -> DataFrame:
    """Point-in-time join: one sort-shuffle, running struct-max.

    on: equality key columns (present in both sides).
    payload: right columns to carry (default: all but keys and ts).
    tolerance_us: max |left_ts - right_ts| in integer microseconds;
      farther matches become NULL (or drop under how='inner').
    how: 'left' (default) or 'inner'.
    """
    right_ts = right_ts or left_ts
    if payload is None:
        payload = [c for c in right.columns if c not in on and c != right_ts]
    _check_args(left, right, payload, direction, how, right_ts_out)
    u = _prep(left, right, list(on), left_ts, right_ts, list(payload),
              direction)
    # rows ordered by (axis, side): at equal timestamps the right row
    # sorts first (side 0 < 1), so an inclusive match sees it.
    w = (Window.partitionBy(*on).orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = u.withColumn(_MATCH, F.max(_MATCH).over(w)) \
               .filter(F.col("_side") == 1)
    return _finish(matched, left.columns, payload, tolerance_us, how,
                   right_ts_out)


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: Sequence[str],
                       left_ts: str = "ts", right_ts: Optional[str] = None,
                       payload: Optional[Sequence[str]] = None,
                       direction: str = "backward",
                       tolerance_us: Optional[int] = None,
                       how: str = "left",
                       right_ts_out: str = "matched_ts",
                       bucket_us: int = 3_600_000_000) -> DataFrame:
    """asof_join for hot keys: windows partition by (key, time bucket),
    so one key's timeline spreads across ceil(span / bucket_us) tasks
    instead of serializing. Carry-in across buckets: the per-bucket
    max-struct relation (one row per non-empty (key, bucket)) is
    prefix-maxed per key — that relation is |buckets| rows, orders of
    magnitude smaller, so ITS per-key window is cheap — and joined back
    as each bucket's inherited match."""
    right_ts = right_ts or left_ts
    if payload is None:
        payload = [c for c in right.columns if c not in on and c != right_ts]
    _check_args(left, right, payload, direction, how, right_ts_out)
    on = list(on)
    u = _prep(left, right, on, left_ts, right_ts, list(payload), direction)
    u = u.withColumn("_b", F.floor(F.col("_t") / F.lit(int(bucket_us))))

    # per-(key, bucket) best right match (map-side combinable aggregate).
    # Grouped over ALL rows, not just right ones: a bucket holding only
    # left rows must still appear here (with a NULL best) so the prefix
    # max below hands it the carry from earlier buckets.
    per_bucket = (u.groupBy(*on, "_b")
                  .agg(F.max(F.when(F.col("_side") == 0, F.col(_MATCH)))
                       .alias("_bm")))
    # running best across buckets per key — window over the TINY relation
    wb = (Window.partitionBy(*on).orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = per_bucket.select(
        *on, "_b", F.max("_bm").over(wb).alias("_carry"))

    # in-bucket window (partitioned by key AND bucket — the scale win)
    w = (Window.partitionBy(*on, "_b").orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    local = u.withColumn("_local", F.max(_MATCH).over(w))
    matched = (local.filter(F.col("_side") == 1)
               .join(carry, on=on + ["_b"], how="left")
               .withColumn(_MATCH, F.greatest("_local", "_carry")))
    return _finish(matched, left.columns, payload, tolerance_us, how,
                   right_ts_out)


def range_join_count(left: DataFrame, right: DataFrame, on: Sequence[str],
                     left_ts: str = "ts", right_ts: Optional[str] = None,
                     lo_us: int = 0, hi_us: int = 1_800_000_000,
                     count_col: str = "n_in_range") -> DataFrame:
    """Count right rows with right_ts in [left_ts+lo_us, left_ts+hi_us]
    per key, attached to every left row. Bucketed equi-join: bucket
    width = span, each left interval overlaps <= 2 buckets.

    Left rows must be DISTINCT as full tuples: the bucket fan-out is
    collapsed by grouping on every left column, so two identical left
    rows would merge into one output row with a doubled count."""
    right_ts = right_ts or left_ts
    on = list(on)
    if hi_us <= lo_us:
        raise ValueError("range_join_count needs hi_us > lo_us")
    _check_reserved(left, right)
    if count_col in left.columns:
        raise ValueError(f"output column {count_col!r} collides with a "
                         "left column; pass a different count_col")
    width = int(hi_us - lo_us)
    lmic = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rmic = F.unix_micros(F.col(right_ts).cast("timestamp"))

    lt = left.withColumn("_lt", lmic)
    # candidate buckets of the interval [_lt+lo, _lt+hi]
    b0 = F.floor((F.col("_lt") + F.lit(int(lo_us))) / F.lit(width))
    b1 = F.floor((F.col("_lt") + F.lit(int(hi_us))) / F.lit(width))
    lt = lt.withColumn("_b", F.explode(F.array_distinct(F.array(b0, b1))))
    rt = (right.select(*on, rmic.alias("_rt"))
          .withColumn("_b", F.floor(F.col("_rt") / F.lit(width))))

    j = (lt.join(rt, on=on + ["_b"], how="left")
         .withColumn("_hit",
                     F.when((F.col("_rt") >= F.col("_lt") + F.lit(int(lo_us)))
                            & (F.col("_rt") <= F.col("_lt") + F.lit(int(hi_us))),
                            F.lit(1)).otherwise(F.lit(0))))
    # a left row appears once per candidate bucket -> re-aggregate by
    # its full identity; count_if collapses the fan-out exactly
    return (j.groupBy(*left.columns)
            .agg(F.sum("_hit").cast("bigint").alias(count_col)))

"""Deterministic corpus sampling + per-group quotas — the subsetting
operators a training-data pipeline runs before/after validation
(curation: downsample boilerplate-heavy sources, cap documents per
domain, draw reproducible eval slices).

Everything here is hash-deterministic (md5 over a seed|key string):
the same (seed, key) always lands on the same side of the threshold, so
samples are reproducible across runs, engines (the md5 hex compare is
DuckDB-portable for the oracle), and cluster sizes — no RNG state, no
`rand()` (which is per-task-seeded in Spark and NOT stable across
re-planning/retries: a retried task would sample a different subset).

Scale notes:
- hash_sample / stratified_sample are pure narrow filters — they fuse
  into the scan, shuffle nothing, and survive any corpus size.
- top_k_per_group uses the standard row_number window; a hot group
  serializes into one reducer task, so `salt` enables the two-phase
  exact variant: per-(group, salt) top-k first (hot group split across
  S reducers), then top-k of the k*S survivors — both phases exact,
  output identical to the unsalted window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _hex_threshold(rate: float) -> str:
    """rate in [0,1] -> threshold string; a key is kept when the first 8
    hex chars of md5(seed|key) compare lexicographically below it
    (lowercase hex compares identically in Spark and DuckDB). rate=1.0
    returns 'g' — above every hex digit, so EVERY key is kept (clamping
    to 'ffffffff' would deterministically drop the ~2^-32 of keys whose
    prefix is exactly the max, a real loss at 10^9+ rows)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sample rate {rate} outside [0, 1]")
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16**8), "08x")


def sample_mark(key: Column, rate: float, seed: str = "gsk") -> Column:
    """Boolean keep-mark for deterministic hash sampling."""
    hx = F.substring(F.md5(F.concat(F.lit(seed + "|"), key.cast("string"))), 1, 8)
    return hx < F.lit(_hex_threshold(rate))


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                seed: str = "gsk") -> DataFrame:
    """Reproducible `rate`-fraction sample keyed on `key_col`. A narrow
    filter (fuses into the scan; no shuffle)."""
    return df.filter(sample_mark(F.col(key_col), rate, seed))


def stratified_sample(df: DataFrame, rates: dict, strata_col: str = "source",
                      key_col: str = "doc_id", default_rate: float = 0.0,
                      seed: str = "gsk") -> DataFrame:
    """Per-stratum sampling rates (e.g. downweight a boilerplate-heavy
    source): rates maps stratum value -> rate; strata not listed use
    default_rate. Still a pure narrow filter.

    The stratum -> threshold lookup is ONE map-literal expression, not a
    CASE-WHEN chain: a chain nests one CaseWhen per stratum (expression
    tree depth O(#strata) — a plan/codegen bomb at 10^4 strata), while
    GetMapValue stays a single flat node whatever the cardinality. An
    unlisted stratum falls through to default_rate; a NULL stratum uses
    rates[None] when given (NULL cannot be a map key — Spark rejects
    null map keys at runtime — so it routes through an explicit isNull
    branch), else default_rate."""
    hx = F.substring(F.md5(F.concat(F.lit(seed + "|"),
                                    F.col(key_col).cast("string"))), 1, 8)
    thr = F.lit(_hex_threshold(default_rate))
    named = sorted((v, r) for v, r in rates.items() if v is not None)
    if named:
        m = F.create_map(*[
            lit for val, rate in named
            for lit in (F.lit(val), F.lit(_hex_threshold(rate)))])
        thr = F.coalesce(m[F.col(strata_col)], thr)
    if None in rates:
        thr = F.when(F.col(strata_col).isNull(),
                     F.lit(_hex_threshold(rates[None]))).otherwise(thr)
    return df.filter(hx < thr)


def top_k_per_group(df: DataFrame, group_col: str, order_col: str, k: int,
                    tie_col: str, descending: bool = True,
                    salt: int = 0) -> DataFrame:
    """Exact top-k rows per group by (order_col, tie_col) — the
    per-domain quality quota. Deterministic: ties break on `tie_col`
    ascending.

    salt=0: one row_number window per group (fine when no group is hot).
    salt=S: two exact phases — top-k within (group, xxhash(tie) % S)
    splits a hot group across S reducer tasks, then the final window
    ranks only the <= k*S survivors per group. Output is IDENTICAL to
    salt=0 (any true top-k row is also top-k within its salt bucket).
    """
    # `rk` is a documented output column; refuse to silently clobber a
    # same-named input column (withColumn overwrites in place)
    if "rk" in df.columns:
        raise ValueError(
            "top_k_per_group adds an output rank column named 'rk'; "
            "rename the existing 'rk' input column first")
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc, F.col(tie_col).asc()]
    if salt > 0:
        # collision-proof internal names (input may carry _sb/_r1)
        sb, r1 = "_sb", "_r1"
        while sb in df.columns:
            sb += "_"
        while r1 in df.columns:
            r1 += "_"
        bucket = (F.xxhash64(F.col(tie_col).cast("string")) % salt).alias(sb)
        phase1 = (df.withColumn(sb, bucket)
                  .withColumn(r1, F.row_number().over(
                      Window.partitionBy(group_col, sb).orderBy(*order)))
                  .filter(F.col(r1) <= k).drop(sb, r1))
        df = phase1
    w = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def pps_systematic(df: DataFrame, step_tokens: int,
                   order_cols: tuple[str, ...] = ("source", "doc_id"),
                   text_col: str = "text",
                   num_parts: int | None = None) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: lay the
    corpus out as one virtual token stream (ordered by order_cols) and
    keep every document whose token interval covers a multiple of
    `step_tokens`. A document with n tokens is selected with probability
    ~ n / step (exactly its share of the token stream) — the classic
    PPS/systematic design for drawing an eval slice whose TOKEN mass is
    unbiased, where uniform doc sampling would over-represent short
    documents. Expected sample size = total_tokens / step.

    Deterministic (no RNG: the grid is fixed by the total order) and
    integer-exact: selection is pure modulo arithmetic on the offsets,
    so the DuckDB oracle (window-sum offsets) reproduces it bit-for-bit.

    Scale: offsets come from pack.chunk_assignments' two-phase
    distributed prefix sum (range partition + P-row base offsets +
    Arrow cumsum) — no single-task global window."""
    from .pack import chunk_assignments

    if step_tokens <= 0:
        raise ValueError("step_tokens must be positive")
    offs = chunk_assignments(df, step_tokens, order_cols=order_cols,
                             text_col=text_col, num_parts=num_parts)
    # a grid point k*step lies in [off, off+n-1] iff off%step == 0 or
    # (off%step) + n - 1 >= step        (n > 0 rows only)
    r = F.col("tok_offset") % step_tokens
    sel = (F.col("n_tok") > 0) & (
        (r == 0) | (r + F.col("n_tok") - 1 >= step_tokens))
    return offs.filter(sel).select(*order_cols, "n_tok", "tok_offset")

"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against a full scan of the corpus; dot products are vectorized
`zip_with`/`aggregate` expressions in double precision, no Python.

Scale path: sign-LSH (random-hyperplane) bucketing — each vector gets an
H-bit signature from deterministic md5-derived hyperplanes; neighbors
are searched only within matching buckets (optionally with multi-probe
on adjacent buckets). At 10^12 vectors the bucket join replaces the
all-pairs scan; brute force remains the rescoring step inside buckets.
An IVF variant (k-means coarse quantizer) would slot in the same way;
sign-LSH is preferred here because it is deterministic and testable
without training state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision (sequential left fold — stable and
    engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "q_id", qvec_col: str = "q_vec") -> DataFrame:
    """Exact top-k by cosine: broadcast the query set, rank per query.
    Returns (q_id, neighbor_id, rank, cos) with deterministic tie-break
    on neighbor id."""
    joined = df.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(qid_col).alias("q_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(qvec_col), F.col(vec_col)), 6).alias("cos"),
    ).filter(F.col("q_id") != F.col("neighbor_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "rank", "cos"))


def _hyperplane(dim: int, h: int, j: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1) from md5 — no RNG
    state, reproducible across engines and runs."""
    import hashlib

    hx = hashlib.md5(f"lsh|{h}|{j}".encode()).hexdigest()[:8]
    return int(hx, 16) / float(2**31) - 1.0


def _plane(dim: int, h: int, table: int = 0):
    """One hyperplane as a python list (tables offset the seed space)."""
    return [_hyperplane(dim, h + 10007 * table, j) for j in range(dim)]


def sign_lsh_signature(vec: Column, dim: int, n_bits: int = 8,
                       table: int = 0) -> Column:
    """H-bit sign signature under fixed md5-derived hyperplanes.

    Each hyperplane is a SINGLE array literal (constant-folded data, not
    dim expression nodes), so the plan stays O(n_bits) nodes regardless
    of dim — at dim=1024 the old per-component expression chain was
    ~16k plan nodes and a driver bottleneck; this is 8-16 literals."""
    bits = []
    for h in range(n_bits):
        plane = F.lit(_plane(dim, h, table))
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def with_lsh_signature_pandas(df: DataFrame, vec_col: str, dim: int,
                              n_bits: int = 8, table: int = 0,
                              out_col: str = "_sig") -> DataFrame:
    """Arrow-batched matmul signature: ONE numpy (batch x dim) @ (dim x
    n_bits) product per batch — the high-dim path (dim >= ~256) where
    even packed expression folds lose to BLAS."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.array([_plane(dim, h, table) for h in range(n_bits)])  # H x dim

    def _sig_fn(v):
        mat = np.vstack(v.to_numpy()).astype("float64")  # batch x dim
        bits = (mat @ planes.T) >= 0.0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    # annotations set explicitly (locally-imported pandas is not visible
    # to the string-hint resolver inside pandas_udf)
    _sig_fn.__annotations__ = {"v": pd.Series, "return": pd.Series}
    _sig = pandas_udf(_sig_fn, "string")
    return df.withColumn(out_col, _sig(F.col(vec_col)))


def _signed(df: DataFrame, vec_col: str, dim: int, n_bits: int, table: int,
            use_pandas: bool, out_col: str = "_sig") -> DataFrame:
    if use_pandas:
        return with_lsh_signature_pandas(df, vec_col, dim, n_bits, table, out_col)
    return df.withColumn(out_col, sign_lsh_signature(F.col(vec_col), dim, n_bits, table))


def _probe_sigs(sig_col: Column, n_bits: int, multi_probe: int) -> Column:
    """Signature + (for multi_probe=1) all 1-bit flips — a pair within
    hamming distance 1 of the query bucket is still probed."""
    if multi_probe <= 0:
        return F.array(sig_col)
    flips = [sig_col]
    for i in range(n_bits):
        flipped_bit = F.when(F.substring(sig_col, i + 1, 1) == "1", "0").otherwise("1")
        flips.append(F.concat(F.substring(sig_col, 1, i), flipped_bit,
                              F.substring(sig_col, i + 2, n_bits - i - 1)))
    return F.array(*flips)


def lsh_topk(df: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "q_id", qvec_col: str = "q_vec",
             n_tables: int = 1, multi_probe: int = 0,
             use_pandas: str | bool = "auto") -> DataFrame:
    """Approximate top-k: candidates = vectors sharing the query's LSH
    bucket in ANY of `n_tables` hash tables (each with independent
    hyperplanes), optionally multi-probing the 1-bit-flip neighbor
    buckets of the query; exact cosine rescoring over the deduped
    candidate set. Recall grows with n_tables and multi_probe; the
    bucket join replaces the all-pairs scan at any scale."""
    if use_pandas == "auto":
        use_pandas = dim >= 256
    cands = None
    for t in range(n_tables):
        data = _signed(df, vec_col, dim, n_bits, t, use_pandas)
        q = _signed(queries, qvec_col, dim, n_bits, t, use_pandas)
        q = q.select(qid_col, qvec_col,
                     F.explode(_probe_sigs(F.col("_sig"), n_bits, multi_probe))
                     .alias("_sig"))
        pairs = data.join(q, "_sig").select(
            F.col(qid_col).alias("q_id"), F.col(qvec_col).alias("_qv"),
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.filter(F.col("q_id") != F.col("neighbor_id")) \
        .dropDuplicates(["q_id", "neighbor_id"])
    scored = cands.select(
        "q_id", "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_nv")), 6).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "rank", "cos"))


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id", vec_col: str = "embedding",
                              n_bits: int = 6, dim: int = 64) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucketed candidate generation,
    exact cosine verification, id_a < id_b."""
    sig = sign_lsh_signature(F.col(vec_col), dim, n_bits)
    d = df.select(F.col(id_col), F.col(vec_col), sig.alias("_sig"))
    a = d.select(F.col("_sig"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = d.select(F.col("_sig"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b"))
    return (pairs.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))

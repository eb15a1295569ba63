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


def sign_lsh_signature(vec: Column, dim: int, n_bits: int = 8) -> Column:
    """H-bit sign signature under fixed md5-derived hyperplanes."""
    bits = []
    for h in range(n_bits):
        weights = [_hyperplane(dim, h, j) for j in range(dim)]
        proj = None
        acc = F.lit(0.0)
        for j, wgt in enumerate(weights):
            acc = acc + F.element_at(vec, j + 1).cast("double") * F.lit(wgt)
        proj = acc
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(df: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "q_id", qvec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: candidates = vectors sharing the query's LSH
    bucket; exact cosine rescoring within the bucket. Recall grows with
    multi-probe / more tables; this single-table variant is the scale
    skeleton (bucket join instead of all-pairs)."""
    sig = sign_lsh_signature(F.col(vec_col), dim, n_bits)
    data = df.withColumn("_sig", sig)
    q = queries.withColumn("_sig", sign_lsh_signature(F.col(qvec_col), dim, n_bits))
    joined = data.join(q, "_sig")
    scored = joined.select(
        F.col(qid_col).alias("q_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(qvec_col), F.col(vec_col)), 6).alias("cos"),
    ).filter(F.col("q_id") != F.col("neighbor_id"))
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

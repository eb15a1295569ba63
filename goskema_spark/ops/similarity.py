"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against a full scan of the corpus; dot products are vectorized
`zip_with`/`aggregate` expressions in double precision, no Python.

Scale path: sign-LSH (random-hyperplane) bucketing — each vector gets an
H-bit signature from deterministic md5-derived hyperplanes; neighbors
are searched only within matching buckets (optionally with multi-probe
on adjacent buckets). At 10^12 vectors the bucket join replaces the
all-pairs scan; brute force remains the rescoring step inside buckets.
IVF-flat is the second scale path: a k-means-style coarse quantizer
(deterministic hash-sampled seeds + fixed Lloyd steps) partitions the
corpus into inverted lists; queries probe their n_probe nearest lists
and rescore exactly inside them — the join scans ~n_probe/n_centroids
of the corpus. Sign-LSH needs no training state; IVF adapts to the data
distribution. Both end in exact cosine rescoring.
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
        data = _signed(df.select(F.col(id_col), F.col(vec_col)), vec_col,
                       dim, n_bits, t, use_pandas)
        q = _signed(queries, qvec_col, dim, n_bits, t, use_pandas)
        q = q.select(qid_col,
                     F.explode(_probe_sigs(F.col("_sig"), n_bits, multi_probe))
                     .alias("_sig"))
        pairs = data.join(q, "_sig").select(
            F.col(qid_col).alias("q_id"), F.col(id_col).alias("neighbor_id"))
        cands = pairs if cands is None else cands.unionByName(pairs)
    # dedup on ID PAIRS ONLY (16 bytes/pair through the exchange), then
    # re-join the vectors for rescoring: carrying dim-sized arrays through
    # the dropDuplicates shuffle is ~8 KB/candidate at dim=1024 and
    # dominates once candidates >> corpus (multi-table x multi-probe).
    # The query set is small by contract (same broadcast as
    # brute_force_topk); the deduped candidate ids are |Q| x bucket-sized,
    # so both rescore joins broadcast — the corpus is never shuffled.
    cands = cands.filter(F.col("q_id") != F.col("neighbor_id")) \
        .dropDuplicates(["q_id", "neighbor_id"])
    qv = queries.select(F.col(qid_col).alias("q_id"),
                        F.col(qvec_col).alias("_qv"))
    rescore = df.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("_nv")) \
        .join(F.broadcast(cands), "neighbor_id") \
        .join(F.broadcast(qv), "q_id")
    scored = rescore.select(
        "q_id", "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_nv")), 6).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "rank", "cos"))


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id", vec_col: str = "embedding",
                              n_bits: int = 6, dim: int = 64,
                              n_tables: int = 1, multi_probe: int = 0,
                              use_pandas: str | bool = "auto") -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucketed candidate generation,
    exact cosine verification, id_a < id_b.

    Recall knobs (same machinery as lsh_topk): `n_tables` independent
    hyperplane sets OR-ed together, and `multi_probe=1` additionally
    joins buckets within hamming distance 1 (the flip side is probed on
    the left relation only — a pair differing by one bit in a table's
    signature still meets). A near-dup pair (cos >= 0.95) disagrees with
    a random hyperplane with probability ~arccos(0.95)/pi ≈ 0.10, so
    P(same 6-bit bucket) ≈ 0.53 per table; 3 tables + 1-bit probe
    pushes pair recall past 0.9 while keeping the join bucketed —
    verified by test_near_dup_recall_high_dim."""
    if use_pandas == "auto":
        use_pandas = dim >= 256
    pairs = None
    for t in range(n_tables):
        d = _signed(df.select(F.col(id_col), F.col(vec_col)), vec_col, dim,
                    n_bits, t, use_pandas)
        a = d.select(F.col(id_col).alias("id_a"),
                     F.explode(_probe_sigs(F.col("_sig"), n_bits, multi_probe))
                     .alias("_sig"))
        b = d.select(F.col("_sig"), F.col(id_col).alias("id_b"))
        p = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b")) \
            .select("id_a", "id_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    # dedup carries ID PAIRS ONLY (16 bytes/pair vs ~2 x dim-sized arrays
    # — ~8 KB/pair at dim=1024); vectors re-join AFTER the dedup, so the
    # corpus ships each vector once per join side instead of once per
    # candidate occurrence (multi-table x multi-probe re-finds the same
    # pair in several buckets). Corpus-x-corpus candidates can exceed any
    # broadcast bound, so these joins stay AQE-planned, not hinted.
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = pairs.join(va, "id_a").join(vb, "id_b")
    return (pairs.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))


# --------------------------------------------------------------------------
# IVF-flat: k-means-style coarse quantizer + inverted lists
# --------------------------------------------------------------------------

def _seed_centroids(df: DataFrame, id_col: str, vec_col: str,
                    n_centroids: int):
    """Deterministic centroid seeds: the n_centroids corpus vectors with
    the smallest xxhash64(id) — a uniform pseudo-random sample with no
    RNG state (reproducible across runs/cluster sizes). ONE small action:
    collects n_centroids vectors (k x dim floats), never the corpus."""
    rows = (df.select(F.col(id_col), F.col(vec_col))
            .orderBy(F.xxhash64(F.col(id_col).cast("string")))
            .limit(n_centroids).collect())
    return [list(map(float, r[vec_col])) for r in rows]


def refine_centroids(df: DataFrame, centroids, vec_col: str = "embedding",
                     steps: int = 1):
    """Optional Lloyd refinement: assign -> per-centroid mean, each step
    one hash-aggregate shuffle over (centroid_id, dim) — fully
    distributed, no per-row Python beyond the Arrow-batched assignment."""
    import numpy as np

    for _ in range(steps):
        assigned = with_centroid_id(df, centroids, vec_col, out_col="_cid")
        means = (assigned.groupBy("_cid")
                 .agg(*[F.avg(F.col(vec_col)[i]).alias(f"c{i}")
                        for i in range(len(centroids[0]))])
                 .collect())
        cmap = {r["_cid"]: [r[f"c{i}"] for i in range(len(centroids[0]))]
                for r in means}
        centroids = [cmap.get(i, c) for i, c in enumerate(centroids)]
    return [[float(x) for x in c] for c in np.asarray(centroids)]


def with_centroid_id(df: DataFrame, centroids, vec_col: str,
                     out_col: str = "_cid", n_probe: int = 1) -> DataFrame:
    """Nearest-centroid assignment (cosine) as ONE Arrow-batched matmul
    per batch. n_probe > 1 emits that many nearest centroid ids
    (array column) for query-side multi-probing."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype="float64")          # k x dim
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def _assign(v):
        mat = np.vstack(v.to_numpy()).astype("float64")  # batch x dim
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ Cn.T                                # batch x k
        if n_probe == 1:
            return pd.Series(np.argmax(sims, axis=1).astype("int32"))
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype("int32")
        return pd.Series([row.tolist() for row in top])

    _assign.__annotations__ = {"v": pd.Series, "return": pd.Series}
    out_t = "int" if n_probe == 1 else "array<int>"
    return df.withColumn(out_col, pandas_udf(_assign, out_t)(F.col(vec_col)))


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "q_id", qvec_col: str = "q_vec",
             lloyd_steps: int = 1, centroids=None) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors are partitioned into
    `n_centroids` inverted lists by nearest centroid; each query probes
    its `n_probe` nearest lists and rescores exactly (cosine) inside
    them. The centroid table is tiny and broadcast; the corpus is
    touched once for assignment and once per search — at 10^12 vectors
    the inverted-list join scans ~n_probe/n_centroids of the corpus
    instead of all of it. Deterministic: hash-sampled seeds + fixed
    Lloyd steps (pass `centroids` to reuse a trained quantizer)."""
    if centroids is None:
        centroids = _seed_centroids(df, id_col, vec_col, n_centroids)
        if lloyd_steps:
            centroids = refine_centroids(df, centroids, vec_col, lloyd_steps)
    data = with_centroid_id(df.select(id_col, vec_col), centroids, vec_col,
                            out_col="_cid")
    q = with_centroid_id(
        queries.select(qid_col, qvec_col), centroids, qvec_col,
        out_col="_cids", n_probe=n_probe)
    q = q.select(qid_col, qvec_col, F.explode("_cids").alias("_cid"))
    pairs = data.join(q, "_cid").filter(F.col(qid_col) != F.col(id_col))
    scored = pairs.select(
        F.col(qid_col).alias("q_id"), F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(qvec_col), F.col(vec_col)), 6).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "neighbor_id", "rank", "cos"))


def embedding_profile(df: DataFrame, vec_col: str = "embedding",
                      by: str = "label",
                      expected_dim: int | None = None) -> DataFrame:
    """Integrity profile of an embedding column — the engine's
    per-column stats (stats.py) extended to vector payloads. Catches the
    classic embedding-pipeline failure modes before a training run
    consumes them: NULL vectors, ragged dimensions (truncated writes),
    NaN/Inf elements (fp16 overflow upstream), zero vectors (dead
    encoder), and L2-norm outliers (un-normalized batches).

    ONE grouped hash aggregate over JVM-side expressions — no Python,
    ONE exchange (n_dims uses size(collect_set), which partial-merges
    map-side, instead of countDistinct, whose rewrite would add a second
    exchange on (by, dim)). The O(dim) array folds happen in a
    pre-projection, ONCE per row: higher-order functions are
    CodegenFallback, so the aggregate layer cannot share subexpressions —
    inlining the fold into each of the 4-5 norm aggregates re-evaluates
    it that many times per row (plan-verified). Norms fold sequentially
    in double precision and round to 6 dp (row-deterministic and
    engine-portable, like `norm`); avg_norm rounds to 4 dp (parallel sum
    order varies in the last bits).

    expected_dim: when given, `n_dim_mismatch` counts vectors whose
    length differs; `n_dims` (distinct lengths) flags raggedness either
    way. A NULL vector counts only in n_null — its dim/badness/norm are
    excluded rather than polluting the other counters. "Bad" means a
    NULL element, NaN, or EXACT ±Inf — a finite float32 of any
    magnitude is data, not corruption."""
    v = F.col(vec_col)
    is_null = v.isNull()
    dim = F.when(~is_null, F.size(v))
    bad = F.when(~is_null, F.exists(
        v, lambda x: x.isNull() | F.isnan(x)
        | (F.abs(x) == F.lit(float("inf")))))
    # two projections so the exists() scan runs ONCE: _nrm's gate reads
    # the _bad alias instead of re-inlining the scan (CollapseProject
    # keeps them separate — _bad is referenced twice and non-cheap)
    pre = df.select(F.col(by), v.alias("_v"), is_null.alias("_null"),
                    dim.alias("_dim"), bad.alias("_bad"))
    nrm = F.when(~F.col("_null") & ~F.col("_bad"),
                 F.round(norm(F.col("_v")), 6))
    pre = pre.select(by, "_null", "_dim", "_bad", nrm.alias("_nrm"))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_null").cast("int")).alias("n_null"),
        F.size(F.collect_set("_dim")).cast("bigint").alias("n_dims"),
        F.sum(F.coalesce(F.col("_bad").cast("int"), F.lit(0))).alias("n_bad"),
        F.sum(F.coalesce((F.col("_nrm") == 0).cast("int"),
                         F.lit(0))).alias("n_zero"),
        F.min("_nrm").alias("min_norm"),
        F.max("_nrm").alias("max_norm"),
        F.round(F.avg("_nrm"), 4).alias("avg_norm"),
    ]
    if expected_dim is not None:
        aggs.insert(3, F.sum(F.coalesce(
            (F.col("_dim") != expected_dim).cast("int"),
            F.lit(0))).alias("n_dim_mismatch"))
    return pre.groupBy(by).agg(*aggs)

"""Deduplication operators over the `documents` table.

Scale design notes (the 100 TB story for each):

  exact            one hash aggregate on md5(text): partial+final combine,
                   no pre-shuffle of payloads — only (fp, doc_id) shuffles.
  minhash LSH      shingle -> K minhashes per doc (one explode + one
                   groupBy), then band keys; candidate pairs come from a
                   self-join ON the band bucket — join fan-out is bounded
                   by bucket size, never all-pairs. AQE handles hot
                   buckets; a bucket-size cap drops degenerate buckets
                   (boilerplate shingles) exactly like production dedup
                   pipelines do.
  n-gram Jaccard   exact verification on candidate pairs only (or, at
                   test scale, on all pairs sharing a shingle).
  simhash          per-doc 16-bit signature via one projection; near-dup
                   pairs via banded prefix buckets on the signature.
  embedding        cosine near-dup via normalized dot product; candidate
                   generation via sign-LSH buckets (ops/similarity.py).

MinHash uses lexicographic MIN over md5(perm || shingle) hex strings —
engine-portable (identical in Spark and any SQL oracle), deterministic,
and as uniform as the md5 low bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

NUM_PERM = 8
BAND_ROWS = 2  # bands of 2 signatures -> 4 bands


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as distinct strings."""
    w = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0)))
    gram = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)))
    return F.array_distinct(F.when(F.size(w) >= n, gram).otherwise(F.array()))


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: fingerprint groups with >1 member.
    Returns (fp, cnt, keep_id) where keep_id is the smallest member id —
    the canonical survivor."""
    fp = F.md5(F.col(text_col)).alias("fp")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("keep_id"))
        .filter(F.col("cnt") > 1)
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = NUM_PERM,
                       shingle_n: int = 3) -> DataFrame:
    """(id, sig_0..sig_{K-1}): minhash per permutation.
    The min over shingles is a vectorized array aggregate, no
    explode/shuffle needed.

    r6: the shingle ARRAY is materialized once behind its own
    projection boundary (`_sh`, referenced num_perm times — non-cheap,
    so CollapseProject keeps the boundary, same mechanism as the
    rowpass gate). The r5 single-projection form inlined the whole
    split/transform/concat_ws/array_distinct shingle construction into
    the filter plus EVERY signature column — interpreted expression
    trees (lambdas) get no common-subexpression elimination, so each
    row built its shingle array nine times. Measured 12.4s -> 5.2s on
    the 50k-doc sf0.1 documents table; identical output values."""
    sh = shingles(F.col(text_col), shingle_n)
    tmp = (df.select(F.col(id_col), sh.alias("_sh"))
           .filter(F.size("_sh") > 0))

    def perm_hash(j):
        return lambda s: F.md5(F.concat(F.lit(f"{j}|"), s))

    cols = [F.col(id_col)]
    for j in range(num_perm):
        mh = F.array_min(F.transform(F.col("_sh"), perm_hash(j)))
        cols.append(mh.alias(f"sig_{j}"))
    return tmp.select(*cols)


def minhash_band_buckets(sigs: DataFrame, id_col: str = "doc_id",
                         num_perm: int = NUM_PERM,
                         band_rows: int = BAND_ROWS) -> DataFrame:
    """(band, bucket, id): LSH band buckets.

    r6: ONE explode instead of a union of per-band selects — the union
    referenced `sigs` once per band, physically duplicating the whole
    signature projection (scan + shingles + num_perm md5 passes) four
    times in the plan. The explode evaluates it once and fans each row
    into its #bands (band, bucket) rows. Same output rows."""
    entries = []
    for b in range(num_perm // band_rows):
        parts = [F.col(f"sig_{b * band_rows + r}") for r in range(band_rows)]
        entries.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *parts)).alias("bucket")))
    return (sigs.select(F.col(id_col),
                        F.explode(F.array(*entries)).alias("_bb"))
            .select("_bb.band", "_bb.bucket", F.col(id_col)))


def minhash_candidate_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", num_perm: int = NUM_PERM,
                            band_rows: int = BAND_ROWS,
                            max_bucket: int = 1000) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band bucket.
    Buckets larger than max_bucket are dropped (degenerate shingles) —
    the standard guard against quadratic fan-out on boilerplate.

    Physical shape (r6): the bucket relation is hash-repartitioned ONCE
    on the join key (band, bucket); the bucket-size aggregate, the
    size-filter join and both sides of the pair self-join all consume
    that same exchange (guide §2.4: operations keyed the same way share
    one exchange — exchange/stage reuse makes the signature pipeline
    execute once, where the r5 shape re-evaluated it for every
    reference: sizes, the size join, and each self-join side). The
    bucket-size relation is NOT broadcast — it is O(#occupied buckets),
    unbounded at corpus scale, and the co-partitioned join needs no
    extra shuffle anyway. AQE coalesces the repartition (column-only
    REPARTITION_BY_COL), so the width stays scale-adaptive."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm)
    buckets = (minhash_band_buckets(sigs, id_col, num_perm, band_rows)
               .repartition("band", "bucket"))
    sizes = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_n"))
    good = (buckets.join(sizes.filter((F.col("_n") > 1)
                                      & (F.col("_n") <= max_bucket)),
                         ["band", "bucket"])
            .drop("_n"))
    a = good.select("band", "bucket", F.col(id_col).alias("id_a"))
    b = good.select("band", "bucket", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  shingle_n: int = 3, threshold: float = 0.5,
                  candidates: DataFrame | None = None,
                  allow_all_pairs: bool = False) -> DataFrame:
    """Exact n-gram Jaccard similarity, restricted to `candidates`
    (id_a, id_b) — normally the output of minhash_candidate_pairs.
    Returns (id_a, id_b, inter, n_a, n_b, jaccard) with jaccard >= threshold.

    Without candidates this joins ALL pairs sharing any shingle —
    quadratic on common shingles and a scale-killer on a real corpus —
    so it requires an explicit allow_all_pairs=True opt-in (test scale
    only). With candidates, the shingle relation is first semi-joined to
    candidate doc ids, so the pair join fans out only over the
    LSH-filtered subset."""
    if candidates is None and not allow_all_pairs:
        raise ValueError(
            "jaccard_pairs without candidates joins all pairs sharing any "
            "shingle (quadratic on boilerplate shingles at corpus scale); "
            "pass candidates=minhash_candidate_pairs(df) or opt in with "
            "allow_all_pairs=True")
    base = df.select(F.col(id_col).alias("_id"),
                     shingles(F.col(text_col), shingle_n).alias("_sh"))
    if candidates is not None:
        # prune the CORPUS to candidate docs BEFORE building/exploding
        # shingles (r5 exploded the whole corpus and semi-joined after
        # the Generate — the filter cannot push below an explode).
        # cand_ids comes from ONE reference to `candidates` via
        # explode(array(id_a, id_b)) — the r5 union of two selects
        # physically duplicated the entire LSH candidate subtree.
        cand_ids = (candidates
                    .select(F.explode(F.array("id_a", "id_b")).alias("_id"))
                    .distinct())
        base = base.join(cand_ids, "_id", "left_semi")
    # doc shingle-set sizes straight off the array — no explode/aggregate
    # round trip (shingles() is array_distinct'd, so size(array) equals
    # the exploded per-doc count exactly)
    sizes = base.select("_id", F.size("_sh").alias("n_sh"))
    # ONE keyed exchange on the shingle feeds both sides of the pair
    # self-join (guide §2.4); without it each side re-scanned and
    # re-exploded the (pruned) corpus
    sh = (base.select("_id", F.explode("_sh").alias("sh"))
          .repartition("sh"))
    a = sh.select(F.col("_id").alias("id_a"), "sh")
    b = sh.select(F.col("_id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")


SIMHASH_BITS = 16


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Bit-string simhash: bit k = sign of sum over words of ±1 where the
    k-th hex digit of md5(word) has its high bit set. Pure expressions;
    hex-digit test keeps it portable across engines."""
    w = F.split(text, " ")

    def bit_sum(k):
        def step(acc, x):
            hit = F.substring(F.md5(x), k + 1, 1).isin(
                "8", "9", "a", "b", "c", "d", "e", "f")
            return acc + F.when(hit, 1).otherwise(-1)
        return F.aggregate(w, F.lit(0), step)

    digits = [F.when(bit_sum(k) >= 0, F.lit("1")).otherwise(F.lit("0"))
              for k in range(bits)]
    return F.concat(*digits)


_HEX_HIGH = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """Single-hash simhash: md5(word) is computed ONCE per word behind a
    projection boundary, then one array-aggregate pass derives all
    `bits` ±1 sums from substrings of that hash (the naive column form
    re-hashes every word per bit — 16x wasted md5 at bits=16). Bit
    semantics identical to simhash()."""
    hashes = F.transform(F.split(F.col(text_col), " "), lambda x: F.md5(x))
    tmp = df.select(F.col(id_col), hashes.alias("_h"))

    def step(acc, h):
        contrib = F.array(*[
            F.when(F.substring(h, k + 1, 1).isin(*_HEX_HIGH), 1).otherwise(-1)
            for k in range(bits)])
        return F.zip_with(acc, contrib, lambda a, c: a + c)

    sums = F.aggregate(F.col("_h"), F.array_repeat(F.lit(0), bits), step)
    tmp2 = tmp.select(F.col(id_col), sums.alias("_s"))
    digits = F.concat(*[
        F.when(F.element_at(F.col("_s"), k + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for k in range(bits)])
    return tmp2.select(F.col(id_col), digits.alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = SIMHASH_BITS,
                       max_hamming: int = 3, band_bits: int = 4) -> DataFrame:
    """Near-dup pairs by simhash: candidates share one of bits/band_bits
    signature bands (pigeonhole: a pair differing in d bits across
    MORE than d bands must agree on at least one band), verified by
    exact hamming distance.

    The guarantee requires #bands > max_hamming; when the requested
    band_bits would violate it (e.g. 4 bands with max_hamming=4 — a
    pair with one differing bit per band is silently lost), band_bits
    auto-narrows to bits // (max_hamming + 1) so banding stays
    EXHAUSTIVE at the declared radius. Tail bits not covered by a full
    band only help recall (they count toward hamming but never split a
    band)."""
    if bits // band_bits <= max_hamming:
        band_bits = max(1, bits // (max_hamming + 1))
    sigs = simhash_signatures(df, text_col, id_col, bits)
    # one explode instead of a union of per-band selects, and one keyed
    # exchange shared by both self-join sides (r6, same rationale as
    # minhash_band_buckets / minhash_candidate_pairs: the r5 shape
    # re-evaluated the signature aggregate once per band per join side)
    entries = [F.struct(
        F.lit(b).alias("band"),
        F.substring("simhash", b * band_bits + 1, band_bits).alias("bucket"))
        for b in range(bits // band_bits)]
    bands = (sigs.select(F.col(id_col), F.col("simhash"),
                         F.explode(F.array(*entries)).alias("_bb"))
             .select("_bb.band", "_bb.bucket", F.col(id_col), F.col("simhash"))
             .repartition("band", "bucket"))
    a = bands.select("band", "bucket", F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"))
    b = bands.select("band", "bucket", F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"))
    pairs = (a.join(b, ["band", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b").distinct())
    ham = F.size(F.filter(
        F.zip_with(F.split("sig_a", ""), F.split("sig_b", ""), lambda x, y: x != y),
        lambda v: v))
    return (pairs.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))

"""Token-budget mixture building — the data-mixing step of a pretraining
pipeline: given target mixture weights per source and a total token
budget, compute per-source sampling rates from the corpus's actual token
totals and draw the mixture deterministically.

This is the published recipe (GPT-3 / Pile / LLaMA data mixing): a
source's share of the training stream is a chosen weight, not its share
of the raw corpus, so small high-quality sources are UPSAMPLED (seen for
multiple epochs) while bulk crawl is subsampled. Here:

  target_tokens(s) = budget * weight(s) / sum(weights)
  rate(s)          = target_tokens(s) / corpus_tokens(s)

rate <= 1 is a plain deterministic hash sample (ops/sample machinery —
narrow filter, no shuffle, reproducible across retries and engines).
rate > 1 (upsample=True) emits floor(rate) full epochs of the source
plus a hash-sampled fractional epoch, labelled by an `epoch` column so a
loader can interleave copies.

Scale story (100 TB): one S-row aggregate (S = #sources) is the only
collect — rate math is driver-side over bounded data, the mixture itself
is a narrow filter (plus an explode over a <=#epochs-element array when
upsampling), fused into the scan. Nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sample import _hex_threshold, sample_mark


def source_token_totals(df: DataFrame, source_col: str = "source",
                        ntok_col: str = "n_tok") -> dict:
    """{source: total tokens} — ONE aggregate, S rows collected (S =
    #sources; bounded like the drift histograms)."""
    rows = (df.groupBy(source_col)
            .agg(F.sum(F.col(ntok_col).cast("long")).alias("_tot"))
            .collect())
    return {r[source_col]: int(r["_tot"]) for r in rows}


def mixture_rates(totals: dict, weights: dict, token_budget: int,
                  upsample: bool = False) -> dict:
    """{source: sampling rate} hitting `token_budget` tokens in
    expectation at the relative `weights` mixture. Pure driver math over
    the bounded totals. Sources without a weight get no rate (dropped
    from the mixture); weighted sources absent from the corpus are
    skipped. Without upsample, rates cap at 1.0 (one epoch max) and the
    realized mixture under-delivers that source's share — the documented
    trade-off, not silently re-normalized."""
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    if None in weights:
        # a None key would (a) crash sorted() over mixed None/str keys
        # and (b) become a null map key, which Spark rejects at runtime;
        # a NULL source is data corruption, not a mixable dataset
        raise ValueError("mixture weights cannot key the NULL source; "
                         "repair source labels first")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("mixture weights must sum > 0")
    rates = {}
    for src, w in weights.items():
        if w < 0:
            raise ValueError(f"negative mixture weight for {src!r}")
        tot = totals.get(src, 0)
        if tot <= 0:
            continue
        # evaluation order matters for bit-exact oracle parity: the
        # DuckDB twin inlines repr(target) and divides by the same
        # integer total
        target = token_budget * w / wsum
        rate = target / tot
        rates[src] = rate if upsample else min(1.0, rate)
    return rates


def build_mixture(df: DataFrame, weights: dict, token_budget: int,
                  source_col: str = "source", ntok_col: str = "n_tok",
                  key_col: str = "doc_id", upsample: bool = False,
                  seed: str = "gsk") -> tuple[DataFrame, dict]:
    """(mixture DataFrame, rates). The mixture carries an `epoch` column
    (always 0 when upsample=False). Deterministic: same corpus + weights
    + budget + seed -> the same mixture, on any cluster size."""
    # cheap declaration guards BEFORE the full-corpus totals aggregate —
    # never run a 100 TB scan for a call that is guaranteed to raise
    if "epoch" in df.columns:
        raise ValueError("build_mixture adds an `epoch` column; rename "
                         "the existing one first")
    # empty-totals dry run fires every weight/budget validation (None
    # key, negative weight, wsum, budget sign) before the scan
    mixture_rates({}, weights, token_budget, upsample=upsample)
    totals = source_token_totals(df, source_col, ntok_col)
    rates = mixture_rates(totals, weights, token_budget, upsample=upsample)

    if not rates:
        return (df.filter(F.lit(False)).withColumn("epoch", F.lit(0)), rates)

    src = F.col(source_col)
    if not upsample:
        thr_map = F.create_map(*[
            lit for s, r in sorted(rates.items())
            for lit in (F.lit(s), F.lit(_hex_threshold(r)))])
        hx = F.substring(
            F.md5(F.concat(F.lit(seed + "|"),
                           F.col(key_col).cast("string"))), 1, 8)
        out = (df.filter(hx < F.coalesce(thr_map[src], F.lit("0")))
               .withColumn("epoch", F.lit(0)))
        return out, rates

    # upsample: floor(rate) full epochs + one hash-sampled fractional
    # epoch; a row's epoch list is empty (row dropped) when it loses the
    # fractional draw and has no full epochs
    full_map = F.create_map(*[
        lit for s, r in sorted(rates.items())
        for lit in (F.lit(s), F.lit(int(r)))])
    frac_map = F.create_map(*[
        lit for s, r in sorted(rates.items())
        for lit in (F.lit(s), F.lit(_hex_threshold(r - int(r))))])
    hx = F.substring(
        F.md5(F.concat(F.lit(seed + "|"),
                       F.col(key_col).cast("string"))), 1, 8)
    n_full = F.coalesce(full_map[src], F.lit(0))
    extra = F.when(hx < F.coalesce(frac_map[src], F.lit("0")), 1).otherwise(0)
    n = (n_full + extra).cast("int")
    # guard: sequence(0, -1) DESCENDS in Spark — empty array, not a range
    epochs = F.when(n >= 1, F.sequence(F.lit(0), n - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return df.withColumn("epoch", F.explode(epochs)), rates

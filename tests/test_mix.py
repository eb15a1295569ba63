"""Tests for token-budget mixture building (ops/mix): rate math,
deterministic sampling parity, epoch upsampling semantics."""

import hashlib

import pytest
from pyspark.sql import functions as F, types as T

from goskema_spark.ops.mix import (build_mixture, mixture_rates,
                                   source_token_totals)
from goskema_spark.ops.sample import _hex_threshold

_SCHEMA = T.StructType([
    T.StructField("source", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_tok", T.LongType(), False),
])


def _corpus(spark, per_source=40):
    rows = [(s, sid * 1000 + i, 10 + (i % 5))
            for sid, s in enumerate(["a", "b", "c"])
            for i in range(per_source)]
    return spark.createDataFrame(rows, _SCHEMA)


def _mark(key, rate, seed="gsk"):
    # independent reimplementation of sample_mark for cross-checking
    hx = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8]
    return hx < _hex_threshold(rate)


def test_mixture_rates_math():
    totals = {"a": 1000, "b": 500, "c": 0, "d": 200}
    # wsum = 4; budget 1200 -> targets a=600, b=300, c=300
    rates = mixture_rates(totals, {"a": 2.0, "b": 1.0, "c": 1.0}, 1200)
    assert rates["a"] == pytest.approx(0.6)
    assert rates["b"] == pytest.approx(0.6)
    assert "c" not in rates          # weighted but absent from corpus
    assert "d" not in rates          # in corpus but unweighted
    # cap at 1.0 without upsample, raw rate with
    capped = mixture_rates({"a": 100}, {"a": 1.0}, 1000)
    assert capped["a"] == 1.0
    up = mixture_rates({"a": 100}, {"a": 1.0}, 1000, upsample=True)
    assert up["a"] == pytest.approx(10.0)
    with pytest.raises(ValueError):
        mixture_rates(totals, {"a": 0.0}, 100)       # wsum == 0
    with pytest.raises(ValueError):
        mixture_rates(totals, {"a": -1.0, "b": 2.0}, 100)


def test_source_token_totals(spark):
    tot = source_token_totals(_corpus(spark))
    assert tot == {"a": 480, "b": 480, "c": 480}


def test_build_mixture_downsample_matches_reference(spark):
    df = _corpus(spark)
    # weights 3:1, budget 480 -> targets a=360, b=120 -> rates .75 / .25
    out, rates = build_mixture(df, {"a": 3.0, "b": 1.0}, 480)
    assert rates == {"a": pytest.approx(0.75), "b": pytest.approx(0.25)}
    got = {(r["source"], r["doc_id"], r["epoch"]) for r in out.collect()}
    exp = {(r["source"], r["doc_id"], 0) for r in df.collect()
           if r["source"] in rates and _mark(r["doc_id"], rates[r["source"]])}
    assert got == exp
    assert all(e == 0 for _, _, e in got)
    # source c carries no weight -> fully dropped
    assert not any(s == "c" for s, _, _ in got)


def test_build_mixture_upsample_epochs(spark):
    df = _corpus(spark)
    # budget 2400, weights 5:1 -> targets a=2000 (rate ~4.1667), b=400
    # (rate ~0.8333): a gets 4 full epochs + fractional, b fractional only
    out, rates = build_mixture(df, {"a": 5.0, "b": 1.0}, 2400,
                               upsample=True)
    assert rates["a"] > 4.0 and rates["b"] < 1.0
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r["source"], r["doc_id"]), []).append(r["epoch"])
    for (src, doc), epochs in by_doc.items():
        n_full = int(rates[src])
        extra = 1 if _mark(doc, rates[src] - n_full) else 0
        assert sorted(epochs) == list(range(n_full + extra)), (src, doc)
    # every a-doc appears at least 4 times; every surviving doc's epoch
    # list is contiguous from 0 (checked above)
    assert all(len(v) >= 4 for (s, _), v in by_doc.items() if s == "a")
    # deterministic: second run identical
    out2, _ = build_mixture(df, {"a": 5.0, "b": 1.0}, 2400, upsample=True)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))


def test_build_mixture_guards(spark):
    df = _corpus(spark).withColumn("epoch", F.lit(9))
    with pytest.raises(ValueError, match="epoch"):
        build_mixture(df, {"a": 1.0}, 100)
    # no overlapping sources -> empty mixture, schema still has epoch
    out, rates = build_mixture(_corpus(spark), {"zz": 1.0}, 100)
    assert rates == {}
    assert out.count() == 0
    assert "epoch" in out.columns
    # a None weight key would become a null map key (Spark rejects those
    # at runtime) — refused loudly, BEFORE the totals scan
    with pytest.raises(ValueError, match="NULL source"):
        build_mixture(_corpus(spark), {None: 1.0, "a": 1.0}, 100)


def test_mixture_plan_is_narrow(spark):
    # the non-upsampled mixture must stay a scan-fused filter: no
    # exchange anywhere in its plan (the totals aggregate is a separate
    # bounded job, not part of the output plan)
    df = _corpus(spark)
    out, _ = build_mixture(df, {"a": 3.0, "b": 1.0}, 480)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

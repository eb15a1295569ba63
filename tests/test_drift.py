"""Tests for distribution drift: the per-group PSI/KS operator must agree
group-by-group with the oracle-proven global operator."""

from pyspark.sql import functions as F, types as T

from goskema_spark.drift import psi_ks_between, psi_ks_by_group

_SCHEMA = T.StructType([
    T.StructField("g", T.StringType(), False),
    T.StructField("v", T.IntegerType(), True),
])


def _data(spark):
    rows = []
    for i in range(400):
        rows.append(("a", i % 50))            # uniform-ish
        rows.append(("b", (i * i) % 50))      # skewed
    return spark.createDataFrame(rows, _SCHEMA)


def _shifted(spark):
    rows = []
    for i in range(400):
        rows.append(("a", (i + 7) % 50))      # same shape, shifted
        rows.append(("b", i % 25))            # genuinely different
    return spark.createDataFrame(rows, _SCHEMA)


def test_by_group_matches_global_per_group(spark):
    cur, ref = _data(spark), _shifted(spark)
    grouped = {r["g"]: (r["psi"], r["ks"])
               for r in psi_ks_by_group(cur, ref, "v", "g", 0, 50, 10).collect()}
    assert set(grouped) == {"a", "b"}
    for g in ("a", "b"):
        row = psi_ks_between(cur.filter(F.col("g") == g),
                             ref.filter(F.col("g") == g),
                             "v", 0, 50, 10).collect()[0]
        assert grouped[g] == (row["psi"], row["ks"]), g
    # b's distribution actually changed; a's barely did
    assert grouped["b"][0] > grouped["a"][0]


def test_by_group_omits_one_sided_groups(spark):
    cur = _data(spark)
    ref = _shifted(spark).filter(F.col("g") == "a")
    got = {r["g"] for r in
           psi_ks_by_group(cur, ref, "v", "g", 0, 50, 10).collect()}
    assert got == {"a"}      # "b" has no reference side -> omitted


def test_by_group_ignores_nulls_in_column(spark):
    cur = _data(spark).withColumn(
        "v", F.when(F.col("v") % 17 == 0, None).otherwise(F.col("v")))
    out = psi_ks_by_group(cur, _shifted(spark), "v", "g", 0, 50, 10)
    assert out.count() == 2  # still one row per group, no NaN poisoning
    for r in out.collect():
        assert r["psi"] is not None and r["ks"] is not None

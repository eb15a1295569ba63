"""Generic codec framework tests (reference dsl/codec_wrap.go:15-78):
decode validation + encode-time revalidation."""

from pyspark.sql import functions as F, types as T

from goskema_spark import schema as S
from goskema_spark.codecs import decode_col, encode_col, get_codec, register_codec, ColumnCodec


def test_decode_rfc3339_and_base64(spark):
    df = spark.createDataFrame([
        ("a", "2024-01-02T03:04:05Z", "aGVsbG8="),
        ("b", "not-a-time", "%%%bad"),
        ("c", None, None),
    ], T.StructType([T.StructField("id", T.StringType()),
                     T.StructField("ts", T.StringType()),
                     T.StructField("blob", T.StringType())]))
    out = decode_col(df, "ts", "rfc3339")
    out = decode_col(out, "blob", "base64")
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["ts_decoded"] is not None
    assert bytes(rows["a"]["blob_decoded"]) == b"hello"
    assert rows["b"]["ts_decoded"] is None and rows["b"]["blob_decoded"] is None
    bpaths = {(v["path"], v["code"]) for v in rows["b"]["_codec_violations"]}
    assert bpaths == {("/ts", "invalid_format"), ("/blob", "invalid_format")}
    assert rows["c"]["_codec_violations"] == []  # nulls are not format errors


def test_epoch_millis_roundtrip(spark):
    df = spark.createDataFrame([(1, 1700000000123)], "id long, ms long")
    dec = decode_col(df, "ms", "epoch_millis")
    codec = get_codec("epoch_millis")
    back = dec.select(codec.encode(F.col("ms_decoded")).alias("ms2"), "ms")
    r = back.collect()[0]
    assert r["ms2"] == r["ms"]


def test_epoch_millis_min_long_nulls(spark):
    """-2^63 must null out, not throw: under non-ANSI Spark
    abs(Long.MIN_VALUE) wraps negative and would slip past a one-sided
    `<= max` clamp into timestamp_millis (ArithmeticException). The
    two-sided range check nulls it like any other out-of-range epoch."""
    lo, hi = -(2**63), 2**63 - 1
    df = spark.createDataFrame(
        [(1, lo), (2, hi), (3, 1700000000123), (4, None)],
        "id long, ms long")
    dec = decode_col(df, "ms", "epoch_millis")
    rows = {r["id"]: r["ms_decoded"] for r in dec.collect()}
    assert rows[1] is None and rows[2] is None
    assert rows[3] is not None and rows[4] is None


def test_encode_time_revalidation(spark):
    """Encoding an out-of-range domain value yields NULL wire output + a
    violation, never silent bad output."""
    df = spark.createDataFrame(
        [("a", 50), ("b", 5000)], "id string, port int")
    f = S.field("port", "int32", min=1, max=1024)
    register_codec(ColumnCodec(name="int_str", wire_type="string",
                               domain_type="int",
                               decode=lambda c: c.cast("int"),
                               encode=lambda c: c.cast("string")))
    out = encode_col(df, f, "int_str")
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["port_encoded"] == "50"
    assert rows["b"]["port_encoded"] is None
    assert any(v["code"] == "too_big" for v in rows["b"]["_codec_violations"])
    assert rows["a"]["_codec_violations"] == []

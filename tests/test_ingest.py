"""Raw-JSON ingest tests — F6 fixtures (FIXTURES.md): token-layer
semantics mirroring reference parse_enforce_test.go:25-91,
api_error_model_test.go:14-71, array_stream_integration_test.go:11-89."""

import json

from pyspark.sql import functions as F, types as T

from goskema_spark import schema as S
from goskema_spark.ingest import (
    PRESENCE_DEFAULT_APPLIED,
    PRESENCE_SEEN,
    PRESENCE_WAS_NULL,
    ParseOpts,
    ingest_json,
    ingest_violations_df,
)

DOCS = [
    '{"doc_id":"j1","tokens":[1,2],"n_tok":2,"source":"web"}',          # valid
    '{"doc_id":"j2","tokens":[1],"n_tok":1,"source":"web","zzz":1}',    # unknown_key
    '{"doc_id":"j3","doc_id":"j3b","tokens":[1],"n_tok":1,"source":"web"}',  # dup key
    '{"doc_id":"j4","tokens":null,"n_tok":0,"source":"web"}',           # WasNull
    '{"doc_id":"j5","tokens":[1],"source":"web"}',                      # default n_tok
    '{"doc_id":"j6","tokens":[1],"n_tok":1,"source":"web","pad":"' + "x" * 300 + '"}',  # > max_bytes
    '{"doc_id":"j7","tokens":[1],"n_tok":1,"source":"web","deep":{"a":{"b":{"c":1}}}}',  # > max_depth
    '{"tokens":[1],"n_tok":1,"source":"web"}',                          # missing doc_id
    'not json at all',                                                   # parse_error
]


def _schema():
    return S.table(
        S.field("doc_id", "string", required=True),
        S.field("tokens", S.array("int32"), required=True),
        S.field("n_tok", "int32", default=0),
        S.field("source", "string", required=True),
        unknown="strict",
    )


def _parsed(spark, opts=None):
    df = spark.createDataFrame([(d,) for d in DOCS], T.StructType(
        [T.StructField("payload", T.StringType(), False)]))
    return ingest_json(df, _schema(),
                       opts=opts or ParseOpts(max_depth=3, max_bytes=256))


def test_ingest_codes_and_paths(spark):
    parsed = _parsed(spark)
    rid = F.coalesce(F.col("doc_id"), F.lit("?"))
    viols = ingest_violations_df(parsed, rid)
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    assert ("j2", "/zzz", "unknown_key") in got
    assert ("j3b", "/doc_id", "duplicate_key") in got  # later value wins, like the reference
    # MaxBytes aborts before parsing (parse.go:154-169) -> no doc_id value
    assert ("?", "", "truncated") in got
    assert ("?", "/doc_id", "required") in got
    assert ("?", "", "parse_error") in got
    # max_depth: nesting beyond 3 -> parse_error at the offending path
    assert ("j7", "/deep/a/b/c", "parse_error") in got


def test_presence_bits(spark):
    rows = {r["doc_id"]: r for r in _parsed(spark).collect()}
    # j4: tokens explicitly null -> Seen + WasNull (presence.go:11-15)
    p4 = rows["j4"]["_presence"]
    assert p4["/tokens"] & PRESENCE_SEEN and p4["/tokens"] & PRESENCE_WAS_NULL
    # j5: n_tok missing with default -> DefaultApplied, not Seen
    p5 = rows["j5"]["_presence"]
    assert p5["/n_tok"] == PRESENCE_DEFAULT_APPLIED
    assert rows["j5"]["n_tok"] == 0
    # j1: plain field -> Seen (plus wire-type bits, masked off here)
    p1 = rows["j1"]["_presence"]["/doc_id"]
    assert p1 & PRESENCE_SEEN and not p1 & PRESENCE_WAS_NULL
    assert not p1 & PRESENCE_DEFAULT_APPLIED


def test_wire_type_bits(spark):
    """Ingest records the JSON wire type of every seen key
    (union_ambiguity.go:76-107 valueMatchesType; patterns.go isInteger:
    a float with zero fraction IS an integer on the wire)."""
    from goskema_spark.ingest import (
        PRESENCE_WIRE_ARRAY, PRESENCE_WIRE_BOOL, PRESENCE_WIRE_INT,
        PRESENCE_WIRE_NUMBER, PRESENCE_WIRE_OBJECT, PRESENCE_WIRE_STRING,
    )
    from goskema_spark.rowpass import _WIRE_BIT_FOR_TYPE, _WIRE_BITS_ALL
    # rowpass mirrors the ingest bit values (no import cycle by design)
    assert _WIRE_BIT_FOR_TYPE == {
        "string": PRESENCE_WIRE_STRING, "number": PRESENCE_WIRE_NUMBER,
        "integer": PRESENCE_WIRE_INT, "boolean": PRESENCE_WIRE_BOOL,
        "object": PRESENCE_WIRE_OBJECT, "array": PRESENCE_WIRE_ARRAY,
    }
    assert _WIRE_BITS_ALL == (PRESENCE_WIRE_STRING | PRESENCE_WIRE_NUMBER
                              | PRESENCE_WIRE_INT | PRESENCE_WIRE_BOOL
                              | PRESENCE_WIRE_OBJECT | PRESENCE_WIRE_ARRAY)
    rows = {r["doc_id"]: r for r in _parsed(spark).collect()}
    p1 = rows["j1"]["_presence"]
    assert p1["/doc_id"] & PRESENCE_WIRE_STRING          # "j1"
    assert not p1["/doc_id"] & PRESENCE_WIRE_NUMBER
    assert p1["/tokens"] & PRESENCE_WIRE_ARRAY           # [1,2]
    assert p1["/n_tok"] & PRESENCE_WIRE_INT              # 2
    assert p1["/n_tok"] & PRESENCE_WIRE_NUMBER           # every int is a number
    # j4: explicit null -> WasNull, no wire bits
    p4 = rows["j4"]["_presence"]["/tokens"]
    assert p4 & PRESENCE_WAS_NULL and not p4 & PRESENCE_WIRE_ARRAY


def test_preserving_encode(spark):
    rows = {r["doc_id"]: r for r in _parsed(spark).collect()}
    # default-applied n_tok is dropped on re-encode (encode_preserve.go:11-28)
    enc5 = json.loads(rows["j5"]["_encoded"])
    assert "n_tok" not in enc5 and enc5["doc_id"] == "j5"
    # explicit null tokens stays null
    enc4 = json.loads(rows["j4"]["_encoded"])
    assert "tokens" in enc4 and enc4["tokens"] is None
    # round-trip of a fully-present doc keeps all fields
    enc1 = json.loads(rows["j1"]["_encoded"])
    assert enc1 == {"doc_id": "j1", "tokens": [1, 2], "n_tok": 2, "source": "web"}


def test_fail_fast_collects_single_issue(spark):
    multi = ['{"zzz":1,"yyy":2,"tokens":[1],"n_tok":1,"source":"web"}']
    import pyspark.sql.types as T2
    df = spark.createDataFrame([(d,) for d in multi], T2.StructType(
        [T2.StructField("payload", T2.StringType(), False)]))
    collect = ingest_json(df, _schema(), opts=ParseOpts()).collect()[0]
    ff = ingest_json(df, _schema(), opts=ParseOpts(fail_fast=True)).collect()[0]
    assert len(collect["_ingest_violations"]) >= 3  # yyy, zzz unknown + doc_id required
    assert len(ff["_ingest_violations"]) == 1
    # deterministic order: unknown keys sorted ascending (api_error_model_test.go:49-71)
    codes = [(v["path"], v["code"]) for v in collect["_ingest_violations"]]
    ypos = codes.index(("/yyy", "unknown_key"))
    zpos = codes.index(("/zzz", "unknown_key"))
    assert ypos < zpos


def test_passthrough_policy(spark):
    sch = S.table(
        S.field("doc_id", "string", required=True),
        S.field("tokens", S.array("int32"), required=True),
        S.field("n_tok", "int32", default=0),
        S.field("source", "string", required=True),
        unknown="passthrough", passthrough_target="extra",
    )
    import pyspark.sql.types as T2
    df = spark.createDataFrame(
        [('{"doc_id":"p1","tokens":[1],"n_tok":1,"source":"web","zzz":42}',)],
        T2.StructType([T2.StructField("payload", T2.StringType(), False)]))
    row = ingest_json(df, sch).collect()[0]
    assert row["extra"] == {"zzz": "42"}
    assert not row["_ingest_violations"]


def test_pattern_keys_passthrough_preserved(spark):
    """Pattern-matched unknown keys under unknown='passthrough'
    (x-kubernetes-preserve-unknown-fields + patternProperties) are
    validated against their pattern value spec AND preserved in the
    passthrough map — never validated-then-dropped (r5 ADVICE fix)."""
    sch = S.table(
        S.field("doc_id", "string", required=True),
        unknown="passthrough", passthrough_target="extra",
    )
    sch.unknown_key_patterns = [("^n_", S.field("_pat", "int64"))]
    import pyspark.sql.types as T2
    df = spark.createDataFrame(
        [('{"doc_id":"p1","n_good":7,"n_bad":"oops","other":true}',)],
        T2.StructType([T2.StructField("payload", T2.StringType(), False)]))
    row = ingest_json(df, sch).collect()[0]
    # all three unknowns survive the round trip, pattern-matched or not
    assert set(row["extra"]) == {"n_good", "n_bad", "other"}
    assert json.loads(row["extra"]["n_good"]) == 7
    # the pattern value spec was still enforced on n_bad
    issues = {(v["path"], v["code"]) for v in row["_ingest_violations"]}
    assert ("/n_bad", "invalid_type") in issues


def test_type_mismatch_emits_invalid_type_not_crash(spark):
    """A payload whose values don't match the declared dtypes must yield
    invalid_type issues (value -> null), never an Arrow crash of the
    whole batch (the reference tokenizer emits invalid_type per value)."""
    import pyspark.sql.types as T2
    docs = [
        '{"doc_id":"a","tokens":"oops","n_tok":"abc","source":"web"}',
        '{"doc_id":"b","tokens":[1,"x",2.5,3],"n_tok":"12","source":7}',
        '{"doc_id":"c","tokens":[1,2],"n_tok":2.75,"source":"web"}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], T2.StructType(
        [T2.StructField("payload", T2.StringType(), False)]))
    rows = {r["doc_id"]: r for r in ingest_json(df, _schema()).collect()}

    a = rows["a"]
    a_issues = {(i["path"], i["code"]) for i in a["_ingest_violations"]}
    assert ("/tokens", "invalid_type") in a_issues
    assert ("/n_tok", "invalid_type") in a_issues
    assert a["tokens"] is None and a["n_tok"] is None

    b = rows["b"]
    b_issues = {(i["path"], i["code"]) for i in b["_ingest_violations"]}
    assert ("/tokens/1", "invalid_type") in b_issues  # "x" not an int
    assert ("/source", "invalid_type") in b_issues    # 7 not a string
    assert b["tokens"] == [1, None, None, 3] or b["tokens"] == [1, None, 2, 3]
    assert b["n_tok"] == 12                           # numeric-string coercion

    c = rows["c"]
    c_issues = {(i["path"], i["code"], i["rule"]) for i in c["_ingest_violations"]}
    assert ("/n_tok", "overflow", "int_fraction") in c_issues


def test_presence_include_exclude_and_allow_nan(spark):
    import pyspark.sql.types as T2
    sch = S.table(
        S.field("doc_id", "string", required=True),
        S.field("score", "double"),
        S.field("n_tok", "int32", default=0),
        S.field("source", "string"),
        unknown="strip",
    )
    docs = ['{"doc_id":"a","score":NaN,"source":"web"}',
            '{"doc_id":"b","score":1.5,"source":"web"}']
    df = spark.createDataFrame([(d,) for d in docs], T2.StructType(
        [T2.StructField("payload", T2.StringType(), False)]))

    # AllowNaN=False (default): NaN -> invalid_type under rule allow_nan
    rows = {r["doc_id"]: r for r in ingest_json(df, sch).collect()}
    assert rows["a"]["score"] is None
    assert any(i["rule"] == "allow_nan" for i in rows["a"]["_ingest_violations"])
    assert rows["b"]["score"] == 1.5

    # AllowNaN=True: NaN passes without an issue (the Arrow bridge stores
    # it as null in the typed column; the preserving encode keeps NaN)
    rows = {r["doc_id"]: r for r in
            ingest_json(df, sch, opts=ParseOpts(allow_nan=True)).collect()}
    assert not any(i["rule"] == "allow_nan"
                   for i in rows["a"]["_ingest_violations"])
    assert "NaN" in rows["a"]["_encoded"]

    # presence Include/Exclude filter the exported map only
    rows = {r["doc_id"]: r for r in
            ingest_json(df, sch, opts=ParseOpts(
                presence_include=["/doc_id", "/score"],
                presence_exclude=["/score"])).collect()}
    assert set(rows["b"]["_presence"].keys()) == {"/doc_id"}


def test_ingest_typed_wire_values(spark):
    """Code-review r4 regressions: (a) timestamp/date/binary fields must
    ingest AND re-encode without crashing the mapInPandas batch,
    (b) a sized-int wire value outside the physical range becomes
    overflow + null instead of silently wrapping in the Arrow cast,
    (c) decimal(p,s) is a first-class ingest dtype (wire conform with
    scale/width checks), not a blanket invalid_type."""
    sch = S.table(
        S.field("id", "string", required=True),
        S.field("ts", "timestamp"),
        S.field("d", "date"),
        S.field("n", "int32"),
        S.field("amt", "decimal(7,2)"),
        unknown="strict",
    )
    docs = [
        '{"id":"a","ts":"2024-01-02T03:04:05Z","d":"2024-01-02",'
        '"n":4294967297,"amt":12.34}',
        '{"id":"b","n":7,"amt":"1.239"}',
        '{"id":"c","amt":"123456.7"}',
        '{"id":"d","amt":"xx"}',
    ]
    df = spark.createDataFrame([(x,) for x in docs], T.StructType(
        [T.StructField("payload", T.StringType(), False)]))
    rows = {r["id"]: r for r in ingest_json(df, sch).collect()}
    viols = {(r["id"], i["path"], i["code"], i["rule"])
             for r in ingest_json(df, sch).collect()
             for i in r["_ingest_violations"]}

    # (a) typed values survive + preserving encode renders wire formats
    assert rows["a"]["ts"] is not None and rows["a"]["d"] is not None
    enc = json.loads(rows["a"]["_encoded"])
    assert enc["ts"].startswith("2024-01-02T03:04:05")
    assert enc["d"] == "2024-01-02"
    # (b) 2^32+1 into int32: overflow + null, NOT a silent wrap to 1
    assert rows["a"]["n"] is None
    assert ("a", "/n", "overflow", "int_range_int32") in viols
    assert rows["b"]["n"] == 7
    # (c) decimal conform: exact value kept; scale loss flagged+rounded;
    # width overflow nulled; garbage -> invalid_type
    from decimal import Decimal
    assert rows["a"]["amt"] == Decimal("12.34")
    assert rows["b"]["amt"] == Decimal("1.24")
    assert ("b", "/amt", "overflow", "decimal_scale") in viols
    assert rows["c"]["amt"] is None
    assert ("c", "/amt", "overflow", "decimal_range") in viols
    assert ("d", "/amt", "invalid_type", "type_decimal") in viols


def test_ingest_nested_default_applied(spark):
    """A missing NESTED field with a declared default materializes the
    default (previously silently null with no issue, while the row pass
    skipped `required` because a default existed)."""
    sch = S.table(
        S.field("id", "string", required=True),
        S.field("cfg", S.table(S.field("mode", "string", default="std"),
                               S.field("level", "int32"), unknown="strip")),
        unknown="strict",
    )
    docs = ['{"id":"a","cfg":{"level":3}}', '{"id":"b","cfg":{"mode":"hot"}}']
    df = spark.createDataFrame([(x,) for x in docs], T.StructType(
        [T.StructField("payload", T.StringType(), False)]))
    rows = {r["id"]: r for r in ingest_json(df, sch).collect()}
    assert rows["a"]["cfg"]["mode"] == "std"   # default materialized
    assert rows["b"]["cfg"]["mode"] == "hot"   # explicit wins


def test_duplicate_key_wire_bits_last_wins(spark):
    """Wire-type bits describe the KEPT (last-wins) value, not an OR
    across all duplicate occurrences: '{"a":"x","a":1}' must record
    INT|NUMBER only — an accumulated STRING|INT would fake an anyOf
    ambiguous_match against the reference's last-wins semantics. Nested
    presence recorded under an earlier occurrence's subtree is purged
    too."""
    from goskema_spark.ingest import (
        PRESENCE_SEEN, PRESENCE_WIRE_INT, PRESENCE_WIRE_NUMBER,
        PRESENCE_WIRE_OBJECT, PRESENCE_WIRE_STRING,
    )
    sch = S.table(S.field("doc_id", "string", required=True),
                  S.field("a", "int64"),
                  unknown="strip")
    docs = ['{"doc_id":"d1","a":"x","a":1}',
            '{"doc_id":"d2","a":{"x":1},"a":2}']
    raw = spark.createDataFrame(
        [(d,) for d in docs],
        T.StructType([T.StructField("payload", T.StringType(), False)]))
    parsed = ingest_json(raw, sch, opts=ParseOpts(on_duplicate_key="warn"))
    rows = {r["doc_id"]: r["_presence"] for r in parsed.collect()}
    p1 = rows["d1"]["/a"]
    assert p1 & PRESENCE_WIRE_INT and p1 & PRESENCE_WIRE_NUMBER
    assert not p1 & PRESENCE_WIRE_STRING
    p2 = rows["d2"]["/a"]
    assert p2 & PRESENCE_WIRE_INT and not p2 & PRESENCE_WIRE_OBJECT
    # the first occurrence's subtree is gone from the presence map
    assert "/a/x" not in rows["d2"]
    # the duplicate itself is still reported (warn severity, last wins)
    assert rows["d1"]["/a"] & PRESENCE_SEEN

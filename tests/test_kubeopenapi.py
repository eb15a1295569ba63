"""OpenAPI v3 / Kubernetes CRD import tests.

Mirrors the reference's kubeopenapi test strategy: minimal import
(kubeopenapi_import_minimal_test.go), $ref resolution
(kubeopenapi_patternprops_refs_test.go), int-or-string
(kubeopenapi_array_list_test.go), and the Alertmanager routes e2e over
the reference's own CRD testdata
(kubeopenapi_alertmanager_e2e_test.go) — the CRD YAML is read from the
reference tree at test time, never copied.
"""

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from goskema_spark.ingest import ParseOpts, ingest_json
from goskema_spark.kubeopenapi import (DuplicateKeyError, import_crd_yaml,
                                       import_openapi, strict_yaml_load_all)
from goskema_spark.rowpass import validate_rows
from goskema_spark.schema import ArraySpec, MapSpec, TableSchema

REF_TESTDATA = "/root/reference/kubeopenapi/testdata"


def test_import_minimal_object():
    sch, warns = import_openapi({
        "type": "object",
        "additionalProperties": False,
        "required": ["name"],
        "properties": {
            "name": {"type": "string", "minLength": 1},
            "replicas": {"type": "integer", "format": "int32",
                         "minimum": 0, "maximum": 100},
            "labels": {"type": "object",
                       "additionalProperties": {"type": "string"}},
        },
    })
    assert sch.unknown == "strict"
    by = {f.name: f for f in sch.fields}
    assert by["name"].required and by["name"].min_str_len == 1
    assert by["replicas"].dtype == "int64" and by["replicas"].int_bits == "int32"
    assert by["replicas"].min == 0 and by["replicas"].max == 100
    assert isinstance(by["labels"].dtype, MapSpec)


def test_ref_defs_resolution_and_cycle():
    sch, warns = import_openapi({
        "type": "object",
        "$defs": {
            "port": {"type": "integer", "minimum": 1, "maximum": 65535},
            "loop": {"type": "object",
                     "properties": {"again": {"$ref": "#/$defs/loop"}}},
        },
        "properties": {
            "port": {"$ref": "#/$defs/port"},
            "ports": {"type": "array", "items": {"$ref": "#/$defs/port"}},
            "l": {"$ref": "#/$defs/loop"},
        },
    })
    by = {f.name: f for f in sch.fields}
    assert by["port"].dtype == "int64" and by["port"].max == 65535
    assert isinstance(by["ports"].dtype, ArraySpec)
    assert by["ports"].dtype.elem == "int64"
    assert by["ports"].dtype.elem_max == 65536  # inclusive max -> exclusive bound
    assert any("cyclic" in w for w in warns)


def test_int_or_string_roundtrip(spark):
    sch, _ = import_openapi({
        "type": "object",
        "properties": {"id": {"type": "string"},
                       "port": {"x-kubernetes-int-or-string": True}},
        "required": ["id"],
    })
    docs = ['{"id":"a","port":8080}', '{"id":"b","port":"http"}',
            '{"id":"c","port":true}']
    df = spark.createDataFrame([(d,) for d in docs], T.StructType(
        [T.StructField("payload", T.StringType(), False)]))
    rows = {r["id"]: r for r in ingest_json(df, sch).collect() if r["id"]}
    assert rows["a"]["port"] == "8080"   # int accepted, rendered as string
    assert rows["b"]["port"] == "http"   # string accepted
    # bool is neither -> invalid_type
    c = [r for r in ingest_json(df, sch).collect() if r["id"] == "c"][0]
    assert any(i["code"] == "invalid_type" and i["path"] == "/port"
               for i in c["_ingest_violations"])


@pytest.mark.skipif(not os.path.isdir(REF_TESTDATA),
                    reason="reference testdata not available")
def test_alertmanager_routes_crd_e2e(spark):
    """Real CRD: nested routes with x-kubernetes-list-type: map on
    receiver — duplicate receivers at the same level are duplicate_item;
    nested unique receivers pass (reference
    kubeopenapi_alertmanager_e2e_test.go)."""
    with open(f"{REF_TESTDATA}/alertmanager_routes_mini.yaml") as fh:
        sch, warns = import_crd_yaml(fh.read(), kind="Alertmanager")

    spec = next(f for f in sch.fields if f.name == "spec")
    assert isinstance(spec.dtype, TableSchema)
    route = next(f for f in spec.dtype.fields if f.name == "route")
    routes = next(f for f in route.dtype.fields if f.name == "routes")
    assert isinstance(routes.dtype, ArraySpec)
    assert routes.dtype.list_map_keys == ["receiver"]

    good = {"apiVersion": "monitoring.coreos.com/v1", "kind": "Alertmanager",
            "spec": {"route": {"receiver": "root",
                               "routes": [{"receiver": "a",
                                           "routes": [{"receiver": "a-child"}]}]}}}
    bad = {"apiVersion": "monitoring.coreos.com/v1", "kind": "Alertmanager",
           "spec": {"route": {"routes": [{"receiver": "x"},
                                         {"receiver": "x"}]}}}
    df = spark.createDataFrame(
        [(json.dumps(good),), (json.dumps(bad),)],
        T.StructType([T.StructField("payload", T.StringType(), False)]))
    parsed = ingest_json(df, sch, opts=ParseOpts())
    rid = F.monotonically_increasing_id()
    _, viols, _ = validate_rows(parsed.drop("_presence", "_ingest_violations",
                                            "_encoded"), sch, rid)
    got = [(r["path"], r["code"]) for r in viols.collect()]
    dups = [p for p, c in got if c == "duplicate_item"]
    assert dups == ["/spec/route/routes/1"], got


def test_allof_ref_merge_controller_gen_style(spark):
    """controller-gen CRDs wrap $refs in allOf (reference resolves these
    structurally); the import deep-merges the branches so the referenced
    object schema fully applies."""
    sch, warns = import_openapi({
        "type": "object",
        "$defs": {
            "Probe": {"type": "object",
                      "required": ["path"],
                      "properties": {
                          "path": {"type": "string", "minLength": 1},
                          "port": {"type": "integer", "minimum": 1,
                                   "maximum": 65535}}},
        },
        "properties": {
            "liveness": {"allOf": [{"$ref": "#/$defs/Probe"}],
                         "properties": {
                             "port": {"maximum": 1024}}},
            "budget": {"allOf": [{"type": "integer", "minimum": 0},
                                 {"maximum": 10}]},
        },
    })
    by = {f.name: f for f in sch.fields}
    live = by["liveness"].dtype
    assert isinstance(live, TableSchema)
    lb = {f.name: f for f in live.fields}
    assert lb["path"].required and lb["path"].min_str_len == 1
    # conjunction: tighter maximum (explicit 1024) beats the $ref's 65535
    assert lb["port"].min == 1 and lb["port"].max == 1024
    assert by["budget"].dtype == "int64"
    assert by["budget"].min == 0 and by["budget"].max == 10

    # e2e: the merged nested schema actually validates
    df = spark.createDataFrame(
        [("a", ("/x", 80), 5), ("b", (None, 9000), 11)],
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("liveness", T.StructType([
                T.StructField("path", T.StringType()),
                T.StructField("port", T.LongType())])),
            T.StructField("budget", T.LongType())]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    assert ("b", "/liveness/path", "required") in got
    assert ("b", "/liveness/port", "too_big") in got
    assert ("b", "/budget", "too_big") in got
    assert not any(r for r in got if r[0] == "a")


def test_anyof_ambiguity_error_strategy(spark):
    """anyOf over a string column: 'error' strategy flags values that
    fully match more than one branch (ambiguous_match, reference
    union_ambiguity.go:61) — e.g. '8080' matches integer AND string."""
    sch, warns = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "target": {"anyOf": [{"type": "integer"},
                                 {"type": "string"}]},
        },
        "required": ["id"],
    })
    # adapter = first typed branch (integer -> int64)
    assert {f.name: f.dtype for f in sch.fields}["target"] == "int64"

    # drive through a string-typed physical column (the CRD wire shape)
    sch2, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "target": {"anyOf": [{"type": "string"},
                                 {"type": "integer"}]},
        },
        "required": ["id"],
    })
    df = spark.createDataFrame(
        [("a", "8080"), ("b", "http"), ("c", None)],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("target", T.StringType())]))
    sch2.unknown = "strip"
    _, viols, _ = validate_rows(df, sch2, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    # '8080' matches both branches -> ambiguous under 'error'
    assert got == {("a", "/target", "ambiguous_match")}


def test_anyof_first_match_strategy(spark):
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "port": {"anyOf": [{"type": "integer"},
                               {"type": "boolean"}]},
        },
    }, ambiguity="first_match")
    df = spark.createDataFrame(
        [("a", "80"), ("b", "true"), ("c", "zzz")],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("port", T.StringType())]))
    sch.unknown = "strip"
    # declared adapter is int64 over a string physical column: drop the
    # schema's own coercion noise by keeping only the anyOf rule rows
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()
           if r["code"] in ("no_match", "ambiguous_match")}
    assert got == {("c", "/port", "no_match")}


def test_anyof_wire_type_fidelity_post_ingest(spark):
    """anyOf branch matching consults the ingest-recorded WIRE type when
    the frame came through raw-JSON ingest (union_ambiguity.go:76-107
    valueMatchesType): '123' — a JSON STRING — under
    anyOf[string,integer] matches exactly one branch post-ingest, while
    the columnar-only path (no _presence) stays ambiguous under the
    documented castability approximation."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "target": {"anyOf": [{"type": "string"},
                                 {"type": "integer"}]},
        },
        "required": ["id"],
    })
    sch.unknown = "strip"
    docs = ['{"id":"a","target":"123"}',   # wire string -> 1 match
            '{"id":"b","target":"http"}']  # wire string -> 1 match
    raw = spark.createDataFrame(
        [(d,) for d in docs],
        T.StructType([T.StructField("payload", T.StringType(), False)]))
    parsed = ingest_json(raw, sch)
    _, viols, _ = validate_rows(parsed, sch, F.col("id"))
    got = {(r["row_id"], r["code"]) for r in viols.collect()
           if r["code"] in ("no_match", "ambiguous_match")}
    assert got == set()  # nothing ambiguous once the wire type is known

    # columnar-only control: the same '123' IS ambiguous (documented
    # divergence when no wire record exists)
    df = spark.createDataFrame(
        [("a", "123")],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("target", T.StringType())]))
    _, viols2, _ = validate_rows(df, sch, F.col("id"))
    got2 = {(r["row_id"], r["code"]) for r in viols2.collect()}
    assert ("a", "ambiguous_match") in got2

    # float with zero fraction IS an integer on the wire (patterns.go
    # isInteger): 2.0 under anyOf[number,integer] matches both -> ambiguous
    sch2, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "ratio": {"anyOf": [{"type": "number"},
                                {"type": "integer"}]},
        },
        "required": ["id"],
    })
    sch2.unknown = "strip"
    raw2 = spark.createDataFrame(
        [('{"id":"c","ratio":2.0}',), ('{"id":"d","ratio":2.5}',)],
        T.StructType([T.StructField("payload", T.StringType(), False)]))
    parsed2 = ingest_json(raw2, sch2)
    _, viols3, _ = validate_rows(parsed2, sch2, F.col("id"))
    got3 = {(r["row_id"], r["code"]) for r in viols3.collect()
            if r["code"] in ("no_match", "ambiguous_match")}
    assert got3 == {("c", "ambiguous_match")}  # 2.5 matches number only


def test_anyof_wire_type_fidelity_nested(spark):
    """The ingest presence map must propagate into NESTED object
    schemas: an anyOf field inside a nested struct resolves on the
    recorded wire type exactly like a top-level one (r5 review:
    _compile_nested dropped out.presence, so nested anyOf fell back to
    the castability approximation and '123' was wrongly ambiguous)."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "spec": {"type": "object",
                     "properties": {
                         "replicas": {"anyOf": [{"type": "string"},
                                                {"type": "integer"}]}}},
        },
        "required": ["id"],
    })
    sch.unknown = "strip"
    raw = spark.createDataFrame(
        [('{"id":"a","spec":{"replicas":"123"}}',)],
        T.StructType([T.StructField("payload", T.StringType(), False)]))
    parsed = ingest_json(raw, sch)
    _, viols, _ = validate_rows(parsed, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()
           if r["code"] in ("no_match", "ambiguous_match")}
    assert got == set()  # wire string -> exactly one branch, even nested


def test_strict_yaml_merge_key_override():
    """YAML merge-key overrides (`<<: *base` + a local re-set of a
    merged key) are legal YAML, NOT duplicates — flatten_mapping
    prepends merged pairs, so dup detection must run on the original
    key nodes (r5 review finding, confirmed by execution)."""
    docs = strict_yaml_load_all(
        "base: &b\n  a: 1\n  b: 2\nderived:\n  <<: *b\n  a: 3\n")
    assert docs == [{"base": {"a": 1, "b": 2},
                     "derived": {"a": 3, "b": 2}}]
    # a true local duplicate NEXT TO a merge key is still caught
    with pytest.raises(DuplicateKeyError):
        strict_yaml_load_all("base: &b\n  q: 1\nd:\n  <<: *b\n  a: 1\n  a: 2\n")


def test_number_items_maximum_inclusive(spark):
    """ADVICE fix: number items keep the INCLUSIVE OpenAPI maximum —
    10.5 violates maximum=10 (the old +1 exclusive conversion let any
    value in (10, 11) pass)."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "w": {"type": "array",
                  "items": {"type": "number", "maximum": 10}},
        },
    })
    spec = {f.name: f for f in sch.fields}["w"].dtype
    assert isinstance(spec, ArraySpec)
    assert spec.elem_max is None and spec.elem_max_incl == 10
    df = spark.createDataFrame(
        [("a", [1.0, 10.0]), ("b", [10.5]), ("c", [11.0])],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("w", T.ArrayType(T.DoubleType()))]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    assert got == {("b", "/w/0", "domain_range"), ("c", "/w/0", "domain_range")}


def test_nested_unknown_key_strict_on_ingest(spark):
    """ADVICE fix: a nested strict object (CRD additionalProperties:
    false) emits unknown_key at the nested path on JSON ingest."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "spec": {"type": "object",
                     "additionalProperties": False,
                     "properties": {"name": {"type": "string"}}},
        },
        "required": ["id"],
    })
    docs = ['{"id":"a","spec":{"name":"x"}}',
            '{"id":"b","spec":{"name":"y","rogue":1}}']
    df = spark.createDataFrame([(d,) for d in docs], T.StructType(
        [T.StructField("payload", T.StringType(), False)]))
    parsed = ingest_json(df, sch)
    got = {(r["id"], i["path"], i["code"])
           for r in parsed.collect() for i in r["_ingest_violations"]}
    assert got == {("b", "/spec/rogue", "unknown_key")}


def test_contains_min_max_primitive(spark):
    """contains/minContains/maxContains on a primitive array (reference
    kubeopenapi/contains.go:16-127, kubeopenapi_contains_test.go
    TestImport_Array_Contains_MinMax_Primitive): matched-count below
    minContains -> too_short, above maxContains -> too_long."""
    sch, warns = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "vals": {"type": "array",
                     "items": {"type": "number"},
                     "contains": {"type": "number"},
                     "minContains": 2, "maxContains": 3},
        },
        "additionalProperties": False,
    })
    spec = {f.name: f for f in sch.fields}["vals"].dtype
    assert isinstance(spec, ArraySpec)
    assert spec.contains_min == 2 and spec.contains_max == 3
    df = spark.createDataFrame(
        [("ok", [1.0, 2.0, 0.0]), ("low", [1.0]),
         ("high", [1.0, 2.0, 3.0, 4.0])],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("vals", T.ArrayType(T.DoubleType()))]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    assert got == {("low", "/vals", "too_short"), ("high", "/vals", "too_long")}


def test_contains_object_required(spark):
    """contains with an object schema honors `required` keys (reference
    contains.go:147-162, TestImport_Array_Contains_Object_Required)."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "items": {"type": "array",
                      "items": {"type": "object",
                                "properties": {"name": {"type": "string"},
                                               "x": {"type": "integer"}}},
                      "contains": {"type": "object", "required": ["name"]},
                      "minContains": 1},
        },
        "additionalProperties": False,
    })
    df = spark.createDataFrame(
        [("ok", [("a", None), (None, 1)]), ("bad", [(None, 1)])],
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("items", T.ArrayType(T.StructType([
                T.StructField("name", T.StringType()),
                T.StructField("x", T.LongType())])))]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()
           if r["rule"] in ("contains_min", "contains_max")}
    assert got == {("bad", "/items", "too_short")}


def test_pattern_properties_key_enforcement(spark):
    """patternProperties key regex (reference patterns.go:48-96,
    TestImport_PatternProperties_MultipleRegex_StringValues): keys must
    match >=1 pattern -> pattern at /<field>/<key>; additionalProperties
    true lifts the enforcement (plan.go:103-115)."""
    base = {
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "labels": {"type": "object",
                       "patternProperties": {"^app-": {"type": "string"},
                                             "^sys-": {"type": "string"}}},
        },
        "required": ["labels"],
    }
    sch, _ = import_openapi(base)
    spec = {f.name: f for f in sch.fields}["labels"].dtype
    assert isinstance(spec, MapSpec) and spec.key_enforce
    assert [p for p, _ in spec.key_patterns] == ["^app-", "^sys-"]
    df = spark.createDataFrame(
        [("ok", {"app-a": "x", "sys-b": "y"}), ("bad", {"bad": "x"})],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("labels", T.MapType(T.StringType(),
                                                        T.StringType()))]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    assert got == {("bad", "/labels/bad", "pattern")}

    # additionalProperties: true -> unmatched keys allowed
    import copy as _copy
    relaxed = _copy.deepcopy(base)
    relaxed["properties"]["labels"]["additionalProperties"] = True
    sch2, _ = import_openapi(relaxed)
    assert not {f.name: f for f in sch2.fields}["labels"].dtype.key_enforce
    sch2.unknown = "strip"
    _, viols2, _ = validate_rows(df, sch2, F.col("id"))
    assert viols2.collect() == []


def test_pattern_properties_value_types(spark):
    """Per-pattern value types (reference patterns.go:155-210
    buildPatternPropertiesValueTypesRefiner): a key matching a typed
    pattern must carry a castable value -> invalid_type at the key path;
    unmatched keys fall back to the additionalProperties schema type."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "conf": {"type": "object",
                     "patternProperties": {"^n_": {"type": "integer"}},
                     "additionalProperties": {"type": "boolean"}},
        },
    })
    spec = {f.name: f for f in sch.fields}["conf"].dtype
    assert isinstance(spec, MapSpec)
    assert spec.key_patterns == [("^n_", "integer")]
    assert spec.ap_type == "boolean" and not spec.key_enforce
    df = spark.createDataFrame(
        [("ok", {"n_x": "12", "flag": "true"}),
         ("badpat", {"n_y": "zz"}),
         ("badap", {"other": "notabool"})],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("conf", T.MapType(T.StringType(),
                                                      T.StringType()))]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"], r["message"])
           for r in viols.collect()}
    assert got == {
        ("badpat", "/conf/n_y", "invalid_type",
         "value type mismatch for patternProperties"),
        ("badap", "/conf/other", "invalid_type",
         "value type mismatch for additionalProperties"),
    }


def test_property_names_pattern(spark):
    """propertyNames.pattern -> key regex on map fields (reference
    plan.go:36-41 buildKeyPatternRefiner, code pattern at the key)."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "env": {"type": "object",
                    "propertyNames": {"pattern": "^[A-Z_]+$"},
                    "additionalProperties": {"type": "string"}},
        },
    })
    spec = {f.name: f for f in sch.fields}["env"].dtype
    assert isinstance(spec, MapSpec) and spec.key_name_pattern == "^[A-Z_]+$"
    df = spark.createDataFrame(
        [("ok", {"HOME": "/", "PATH_X": "y"}), ("bad", {"lower": "v"})],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("env", T.MapType(T.StringType(),
                                                     T.StringType()))]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"], r["message"])
           for r in viols.collect()}
    assert got == {("bad", "/env/lower", "pattern", "key does not match pattern")}


def test_nested_anyof_ambiguity(spark):
    """anyOf ambiguity rules attach at ANY depth (reference
    plan.go:178-211 builds the refiner per property): a nested anyOf
    emits ambiguous_match at /parent/child (VERDICT r3 #4)."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "parent": {"type": "object",
                       "properties": {
                           "child": {"anyOf": [{"type": "string"},
                                               {"type": "integer"}]}}},
        },
    })
    parent = {f.name: f for f in sch.fields}["parent"].dtype
    assert isinstance(parent, TableSchema)
    child = {f.name: f for f in parent.fields}["child"]
    assert child.anyof_branches is not None
    df = spark.createDataFrame(
        [("a", ("8080",)), ("b", ("http",)), ("c", (None,)), ("d", None)],
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("parent", T.StructType([
                T.StructField("child", T.StringType())]))]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    # '8080' matches both branches -> ambiguous, at the NESTED path;
    # null child and null parent emit nothing
    assert got == {("a", "/parent/child", "ambiguous_match")}


def test_embedded_resource_object_and_array(spark):
    """x-kubernetes-embedded-resource presence checks (reference
    embedded.go:19-75, kubeopenapi_embedded_test.go): apiVersion/kind/
    metadata required on the embedded object or on each array element."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "res": {"type": "object",
                    "properties": {"apiVersion": {"type": "string"},
                                   "kind": {"type": "string"},
                                   "metadata": {"type": "object",
                                                "additionalProperties":
                                                    {"type": "string"}}},
                    "x-kubernetes-embedded-resource": True},
            "items": {"type": "array",
                      "items": {"type": "object",
                                "properties": {"apiVersion": {"type": "string"},
                                               "kind": {"type": "string"},
                                               "metadata": {"type": "object",
                                                            "additionalProperties":
                                                                {"type": "string"}}},
                                "x-kubernetes-embedded-resource": True}},
        },
    })
    by = {f.name: f for f in sch.fields}
    assert by["res"].embedded_resource
    assert isinstance(by["items"].dtype, ArraySpec)
    assert by["items"].dtype.embedded_resource

    emb_t = T.StructType([T.StructField("apiVersion", T.StringType()),
                          T.StructField("kind", T.StringType()),
                          T.StructField("metadata", T.MapType(
                              T.StringType(), T.StringType()))])
    df = spark.createDataFrame(
        [("good", ("v1", "Pod", {}), [("v1", "Pod", {})]),
         ("noapi", (None, "Pod", {}), None),
         ("elem", None, [("v1", "Pod", {}), (None, None, {})])],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("res", emb_t),
                      T.StructField("items", T.ArrayType(emb_t))]))
    sch.unknown = "strip"
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()
           if r["rule"] == "embedded_resource"}
    assert got == {
        ("noapi", "/res/apiVersion", "required"),
        ("elem", "/items/1/apiVersion", "required"),
        ("elem", "/items/1/kind", "required"),
    }

    # reference parity switch: embedded checks off -> no rules compiled
    sch_off, _ = import_openapi({
        "type": "object",
        "properties": {"res": {"type": "object",
                               "properties": {"apiVersion": {"type": "string"}},
                               "x-kubernetes-embedded-resource": True}},
    }, embedded_checks=False)
    assert not {f.name: f for f in sch_off.fields}["res"].embedded_resource


def test_additional_properties_schema_validates_overflow(spark):
    """additionalProperties-with-schema on an object that also declares
    properties: overflow keys VALIDATE against the value spec instead of
    warn+strip (beyond the reference MVP, kubeopenapi.go:157-160;
    VERDICT r3 #7) — wrong-typed values emit invalid_type at their path,
    on both the row pass and JSON ingest."""
    sch, warns = import_openapi({
        "type": "object",
        "properties": {"id": {"type": "string"}},
        "required": ["id"],
        "additionalProperties": {"type": "integer"},
    })
    assert sch.unknown == "schema" and sch.ap_field is not None

    # row pass over physical overflow columns
    df = spark.createDataFrame(
        [("a", "12"), ("b", "zz")],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("extra", T.StringType())]))
    _, viols, _ = validate_rows(df, sch, F.col("id"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    assert got == {("b", "/extra", "invalid_type")}

    # JSON ingest: overflow values validate, then drop from the struct
    docs = ['{"id":"a","extra":3}', '{"id":"b","extra":"zz"}']
    jdf = spark.createDataFrame([(d,) for d in docs], T.StructType(
        [T.StructField("payload", T.StringType(), False)]))
    parsed = ingest_json(jdf, sch)
    igot = {(r["id"], i["path"], i["code"])
            for r in parsed.collect() for i in r["_ingest_violations"]}
    assert igot == {("b", "/extra", "invalid_type")}


def test_import_does_not_mutate_caller_document():
    """ADVICE r3: allOf normalization deep-merges in place — the import
    must deepcopy so the caller's schema object is never rewritten."""
    import copy as _copy
    doc = {
        "type": "object",
        "$defs": {"Probe": {"type": "object",
                            "properties": {"path": {"type": "string"}}}},
        "properties": {
            "liveness": {"allOf": [{"$ref": "#/$defs/Probe"}],
                         "properties": {"port": {"type": "integer"}}},
        },
    }
    snapshot = _copy.deepcopy(doc)
    import_openapi(doc)
    assert doc == snapshot


def test_pattern_properties_alongside_properties(spark):
    """JSON Schema: a key matching patternProperties is NOT 'additional'
    — on an object that ALSO declares properties with
    additionalProperties: false, pattern-matched keys must be exempt
    from unknown_key and validate against the pattern's value schema
    (code-review r4 finding: they were silently flagged unknown_key)."""
    sch, warns = import_openapi({
        "type": "object",
        "properties": {"name": {"type": "string"}},
        "patternProperties": {"^x_": {"type": "integer"}},
        "additionalProperties": False,
        "required": ["name"],
    })
    assert sch.unknown == "strict" and sch.unknown_key_patterns

    df = spark.createDataFrame(
        [("a", "12", None), ("b", "zz", None), ("c", None, "v")],
        T.StructType([T.StructField("name", T.StringType()),
                      T.StructField("x_n", T.StringType()),
                      T.StructField("rogue", T.StringType())]))
    _, viols, _ = validate_rows(df, sch, F.col("name"))
    got = {(r["row_id"], r["path"], r["code"]) for r in viols.collect()}
    # x_n is pattern-matched: NOT unknown_key; bad value -> invalid_type;
    # rogue matches nothing -> unknown_key (every row: column-level)
    assert ("a", "/x_n", "unknown_key") not in got
    assert ("b", "/x_n", "invalid_type") in got
    assert all((rid, "/rogue", "unknown_key") in got for rid in ("a", "b", "c"))

    # same exemption on JSON ingest
    docs = ['{"name":"a","x_n":3}', '{"name":"b","x_n":"zz"}',
            '{"name":"c","rogue":1}']
    jdf = spark.createDataFrame([(d,) for d in docs], T.StructType(
        [T.StructField("payload", T.StringType(), False)]))
    igot = {(r["name"], i["path"], i["code"])
            for r in ingest_json(jdf, sch).collect()
            for i in r["_ingest_violations"]}
    assert igot == {("b", "/x_n", "invalid_type"),
                    ("c", "/rogue", "unknown_key")}


def test_pattern_properties_common_type_multi_pattern():
    """Two patterns sharing ONE scalar type keep the typed map value
    (code-review r4 finding: the old pattern-count check degraded any
    multi-pattern schema to map<string,string>)."""
    sch, warns = import_openapi({
        "type": "object",
        "properties": {
            "m": {"type": "object",
                  "patternProperties": {"^a_": {"type": "integer"},
                                        "^b_": {"type": "integer"}}},
        },
    })
    spec = {f.name: f for f in sch.fields}["m"].dtype
    assert isinstance(spec, MapSpec) and spec.value == "int64"
    # a typed + an untyped pattern still degrades, now WITH a warning
    sch2, warns2 = import_openapi({
        "type": "object",
        "properties": {
            "m": {"type": "object",
                  "patternProperties": {"^a_": {"type": "integer"},
                                        "^b_": {}}},
        },
    })
    assert {f.name: f for f in sch2.fields}["m"].dtype.value == "string"
    assert any("heterogeneous" in w for w in warns2)


def test_strict_yaml_duplicate_key_root():
    """Reference yaml_strict_test.go TestStrictYAMLReader_DuplicateKey_Root:
    a duplicated root mapping key errors with both positions (1-based)."""
    from goskema_spark.kubeopenapi import DuplicateKeyError, strict_yaml_load_all
    import pytest as _pt
    with _pt.raises(DuplicateKeyError) as ei:
        strict_yaml_load_all("kind: A\nkind: B\n")
    e = ei.value
    assert e.key == "kind"
    assert e.first_line > 0 and e.line > 0 and e.line > e.first_line


def test_strict_yaml_duplicate_key_nested():
    """TestStrictYAMLReader_DuplicateKey_Nested: duplicates inside a
    nested mapping are caught too."""
    from goskema_spark.kubeopenapi import DuplicateKeyError, strict_yaml_load_all
    import pytest as _pt
    with _pt.raises(DuplicateKeyError) as ei:
        strict_yaml_load_all("metadata:\n  name: a\n  name: b\n")
    assert ei.value.key == "name"


def test_strict_yaml_multidoc_and_scalars():
    """TestStrictYAMLReader_ReadAll_MultiDoc + scalar tag resolution."""
    from goskema_spark.kubeopenapi import strict_yaml_load_all
    docs = strict_yaml_load_all(
        "kind: A\nn: 7\nf: 1.5\nb: true\nz: null\n---\nkind: B\n")
    assert len(docs) == 2
    assert docs[0] == {"kind": "A", "n": 7, "f": 1.5, "b": True, "z": None}
    assert docs[1] == {"kind": "B"}


_BUNDLE = """\
apiVersion: apiextensions.k8s.io/v1
kind: CustomResourceDefinition
metadata:
  name: widgets.example.com
spec:
  names:
    kind: Widget
  versions:
    - name: v1
      schema:
        openAPIV3Schema:
          type: object
          properties:
            spec:
              type: object
              properties:
                size: {type: integer}
---
apiVersion: apiextensions.k8s.io/v1
kind: CustomResourceDefinition
metadata:
  name: gadgets.example.com
spec:
  names:
    kind: Gadget
  versions:
    - name: v1
      schema:
        openAPIV3Schema:
          type: object
          properties:
            spec:
              type: object
              properties:
                color: {type: string}
"""


def test_import_crd_yaml_select_by_metadata_name():
    """ImportYAMLForCRDName (reference yaml.go:46-70): select a CRD out
    of a multi-doc bundle by metadata.name, not spec.names.kind."""
    sch, _ = import_crd_yaml(_BUNDLE, name="gadgets.example.com")
    spec = {f.name: f for f in sch.fields}.get("spec")
    assert spec is not None
    inner = {f.name for f in spec.dtype.fields}
    assert inner == {"color"}
    # unknown name -> clear error (yaml.go:69)
    import pytest as _pt
    with _pt.raises(ValueError, match="no CustomResourceDefinition"):
        import_crd_yaml(_BUNDLE, name="nope.example.com")


def test_import_crd_yaml_strict_duplicate_key():
    """import_crd_yaml decodes through the strict reader by default: a
    duplicated key anywhere in the bundle refuses to silently last-win
    (the engine's own ingest contract); strict=False restores the
    permissive decode."""
    from goskema_spark.kubeopenapi import DuplicateKeyError
    dup = _BUNDLE.replace("  name: widgets.example.com",
                          "  name: widgets.example.com\n  name: dup.example.com")
    import pytest as _pt
    with _pt.raises(DuplicateKeyError):
        import_crd_yaml(dup, name="gadgets.example.com")
    sch, _ = import_crd_yaml(dup, name="gadgets.example.com", strict=False)
    assert sch is not None


def test_strict_yaml_scalars_match_safe_load():
    """strict=True must change ONLY duplicate-key behavior: YAML 1.1
    scalars (yes/no/on/off bools, octal ints, .inf floats) resolve
    exactly as yaml.safe_load does. A hand-rolled tag switch that maps
    only 'true'/'false' turns 'no' into a truthy string — and a
    'served: no' CRD version would wrongly import."""
    import yaml
    text = ("a: yes\nb: no\nc: on\nd: off\ne: 0777\nf: .inf\n"
            "g: ~\nh: 2024-01-01\n")
    from goskema_spark.kubeopenapi import strict_yaml_load_all
    assert strict_yaml_load_all(text) == [yaml.safe_load(text)]
    assert strict_yaml_load_all(text)[0]["b"] is False


def test_strict_import_skips_served_no_version():
    """A version with `served: no` (YAML 1.1 bool) is skipped in favor
    of a served one, identically under strict and permissive decode."""
    crd = """\
apiVersion: apiextensions.k8s.io/v1
kind: CustomResourceDefinition
metadata:
  name: things.example.com
spec:
  names:
    kind: Thing
  versions:
    - name: v1
      served: no
      schema:
        openAPIV3Schema:
          type: object
          properties:
            spec:
              type: object
              properties:
                old_prop: {type: string}
    - name: v2
      served: yes
      schema:
        openAPIV3Schema:
          type: object
          properties:
            spec:
              type: object
              properties:
                new_prop: {type: string}
"""
    for strict in (True, False):
        sch, _ = import_crd_yaml(crd, kind="Thing", strict=strict)
        spec = {f.name: f for f in sch.fields}["spec"]
        assert {f.name for f in spec.dtype.fields} == {"new_prop"}, strict


def test_import_crd_yaml_positional_compat():
    """The r5 `name`/`strict` parameters are keyword-only: the original
    positional order (text, kind, ambiguity, embedded_checks) still
    binds — a caller passing ambiguity third must not have it swallowed
    by a new parameter."""
    sch, _ = import_crd_yaml(_BUNDLE, "Widget", "first_match", True)
    assert {f.name for f in sch.fields} == {"spec"}


def test_anyof_array_branch_wire_refutation(spark):
    """PRESENCE_WIRE_OBJECT/ARRAY are live: an object/array-typed anyOf
    branch has no columnar probe (treated always-matching), but the
    ingest-recorded wire type CAN refute it — a wire STRING under
    anyOf[string,array] matches exactly ONE branch post-ingest instead
    of staying falsely ambiguous."""
    sch, _ = import_openapi({
        "type": "object",
        "properties": {
            "id": {"type": "string"},
            "target": {"anyOf": [{"type": "string"},
                                 {"type": "array",
                                  "items": {"type": "string"}}]},
        },
        "required": ["id"],
    })
    sch.unknown = "strip"
    raw = spark.createDataFrame(
        [('{"id":"a","target":"hello"}',)],
        T.StructType([T.StructField("payload", T.StringType(), False)]))
    parsed = ingest_json(raw, sch)
    _, viols, _ = validate_rows(parsed, sch, F.col("id"))
    got = {(r["row_id"], r["code"]) for r in viols.collect()
           if r["code"] in ("no_match", "ambiguous_match")}
    assert got == set()

    # columnar-only control: the array branch is unscorable -> counts as
    # a match alongside string -> ambiguous (documented approximation)
    df = spark.createDataFrame(
        [("a", "hello")],
        T.StructType([T.StructField("id", T.StringType()),
                      T.StructField("target", T.StringType())]))
    _, viols2, _ = validate_rows(df, sch, F.col("id"))
    got2 = {(r["row_id"], r["code"]) for r in viols2.collect()}
    assert ("a", "ambiguous_match") in got2

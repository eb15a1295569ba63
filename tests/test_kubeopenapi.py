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
from goskema_spark.kubeopenapi import import_crd_yaml, import_openapi
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

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

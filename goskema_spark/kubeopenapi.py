"""OpenAPI v3 / Kubernetes CRD schema import.

Compiles the structural-v1 subset of OpenAPI v3 (and full CRD documents)
into a TableSchema, so Kubernetes-style contracts validate through the
same columnar row pass as every other schema.

Reference parity (semantics, not code):
  - entry + CRD unwrap          kubeopenapi/kubeopenapi.go:14-100
  - unknown-field policy        kubeopenapi/kubeopenapi.go:146-165
  - property planning           kubeopenapi/kubeopenapi.go:167-190
  - local $ref / $defs          kubeopenapi/refs.go:14-70 (shallow merge,
                                cycle -> warn and skip)
  - int-or-string               kubeopenapi/adapters.go:46-51
  - list-type set/map           kubeopenapi/list.go:17-140 (compiled into
                                the row pass via ArraySpec.list_set /
                                list_map_keys, code duplicate_item)

Supported keywords: type, properties, required, additionalProperties,
items, $ref/#/$defs (and #/definitions), enum, pattern, default,
minimum/maximum, minLength/maxLength, minItems/maxItems, nullable,
format (date-time, int32/int64), x-kubernetes-int-or-string,
x-kubernetes-list-type, x-kubernetes-list-map-keys,
x-kubernetes-preserve-unknown-fields.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Optional

from goskema_spark.schema import ArraySpec, Field, MapSpec, TableSchema

_SCALARS = {"string": "string", "boolean": "bool", "integer": "int64",
            "number": "double"}


# --------------------------------------------------------------------------
# $ref resolution (local $defs / definitions only, like the reference MVP)
# --------------------------------------------------------------------------

def _extract_defs(root: dict) -> dict:
    defs = {}
    if isinstance(root.get("$defs"), dict):
        defs.update(root["$defs"])
    if isinstance(root.get("definitions"), dict):
        defs.update(root["definitions"])
    return defs


def _resolve_refs(node: Any, defs: dict, warns: list, stack: tuple = ()) -> Any:
    """Expand local $refs recursively with a shallow merge (explicit keys
    in the referring schema win); cycles warn and stay unexpanded."""
    if not isinstance(node, dict):
        return node
    node = dict(node)
    ref = node.pop("$ref", None)
    if isinstance(ref, str):
        key = None
        for prefix in ("#/$defs/", "#/definitions/"):
            if ref.startswith(prefix):
                key = ref[len(prefix):]
                break
        if key is None:
            warns.append(f"$ref {ref!r} not supported (local $defs only)")
        elif key in stack:
            warns.append(f"cyclic $ref at {ref} (skipping expansion)")
        elif key not in defs:
            warns.append(f"$ref to unknown definition {key!r}")
        else:
            base = _resolve_refs(copy.deepcopy(defs[key]), defs, warns,
                                 stack + (key,))
            for k, v in base.items():
                node.setdefault(k, v)
    for sub in ("properties",):
        if isinstance(node.get(sub), dict):
            node[sub] = {k: _resolve_refs(v, defs, warns, stack)
                         for k, v in node[sub].items()}
    for sub in ("items", "additionalProperties"):
        if isinstance(node.get(sub), dict):
            node[sub] = _resolve_refs(node[sub], defs, warns, stack)
    return node


# --------------------------------------------------------------------------
# CRD unwrap
# --------------------------------------------------------------------------

def _unwrap_crd(root: dict) -> Optional[dict]:
    """spec.versions[].schema.openAPIV3Schema (preferring served=true),
    falling back to legacy spec.validation.openAPIV3Schema."""
    spec = root.get("spec")
    if not isinstance(spec, dict):
        return None
    first = None
    for v in spec.get("versions") or []:
        if not isinstance(v, dict):
            continue
        oas = (v.get("schema") or {}).get("openAPIV3Schema") \
            if isinstance(v.get("schema"), dict) else None
        if isinstance(oas, dict):
            if v.get("served", True):
                return oas
            first = first or oas
    if first is not None:
        return first
    val = spec.get("validation")
    if isinstance(val, dict) and isinstance(val.get("openAPIV3Schema"), dict):
        return val["openAPIV3Schema"]
    return None


# --------------------------------------------------------------------------
# schema mapping
# --------------------------------------------------------------------------

def _unknown_policy(doc: dict, warns: list):
    if doc.get("x-kubernetes-preserve-unknown-fields") is True:
        return "passthrough", "_unknown"
    ap = doc.get("additionalProperties")
    if ap is False:
        return "strict", None
    if isinstance(ap, dict):
        warns.append("additionalProperties schema on an object with "
                     "properties is treated as permissive (strip)")
    return "strip", None


def _scalar_field(name: str, ps: dict, required: bool, warns: list) -> Field:
    t = ps.get("type", "")
    dtype = _SCALARS.get(t)
    if dtype is None:
        warns.append(f"property {name!r}: unknown type {t!r} treated as string")
        dtype = "string"
    fmt = ps.get("format")
    int_bits = None
    if dtype == "int64" and fmt in ("int32", "int64"):
        int_bits = fmt
    f = Field(
        name=name, dtype=dtype, required=required,
        nullable=not (required and not ps.get("nullable", True)),
        default=ps.get("default"), enum=ps.get("enum"),
        pattern=ps.get("pattern"),
        min=ps.get("minimum"), max=ps.get("maximum"),
        min_str_len=ps.get("minLength"), max_str_len=ps.get("maxLength"),
        int_bits=int_bits,
        format="rfc3339" if fmt == "date-time" else None,
    )
    return f


def _array_field(name: str, ps: dict, required: bool, warns: list) -> Field:
    items = ps.get("items")
    spec = ArraySpec(elem="string", elem_nullable=True,
                     min_len=ps.get("minItems"), max_len=ps.get("maxItems"))
    if isinstance(items, dict):
        if items.get("x-kubernetes-int-or-string") is True:
            spec.elem = "string"
        elif items.get("type") == "object" or "properties" in items:
            spec.elem_schema = _import_object(items, warns)
        else:
            it = items.get("type", "")
            spec.elem = _SCALARS.get(it, "string")
            if spec.elem == "int64":
                spec.elem = "int32" if items.get("format") == "int32" else "int64"
            if items.get("minimum") is not None:
                spec.elem_min = items["minimum"]
            if items.get("maximum") is not None:
                # our elem_max bound is exclusive
                spec.elem_max = items["maximum"] + 1
    else:
        warns.append(f"array {name!r} without items treated as array<string>")
    lt = ps.get("x-kubernetes-list-type")
    if lt == "set":
        spec.list_set = True
    elif lt == "map":
        keys = ps.get("x-kubernetes-list-map-keys") or []
        if keys:
            spec.list_map_keys = [str(k) for k in keys]
        else:
            warns.append(f"list-type map on {name!r} without list-map-keys")
    return Field(name=name, dtype=spec, required=required)


def _prop_field(name: str, ps: Any, required: bool, warns: list) -> Field:
    if not isinstance(ps, dict):
        warns.append(f"property {name!r}: non-object schema treated as string")
        return Field(name=name, dtype="string", required=required)
    if ps.get("x-kubernetes-int-or-string") is True:
        return Field(name=name, dtype="string", required=required,
                     int_or_string=True)
    t = ps.get("type", "")
    if t == "object" or (t == "" and ("properties" in ps or
                                      "additionalProperties" in ps)):
        if isinstance(ps.get("properties"), dict) and ps["properties"]:
            return Field(name=name, dtype=_import_object(ps, warns),
                         required=required)
        ap = ps.get("additionalProperties")
        if isinstance(ap, dict):
            vt = _SCALARS.get(ap.get("type", "string"), "string")
            elem = _scalar_field("value", ap, ap.get("nullable") is False, warns) \
                if ap.get("type") in _SCALARS else None
            return Field(name=name,
                         dtype=MapSpec(value=vt, elem_field=elem),
                         required=required)
        warns.append(f"object {name!r} without properties treated as "
                     "map<string,string>")
        return Field(name=name, dtype=MapSpec(value="string"), required=required)
    if t == "array":
        return _array_field(name, ps, required, warns)
    return _scalar_field(name, ps, required, warns)


def _import_object(doc: dict, warns: list) -> TableSchema:
    unknown, target = _unknown_policy(doc, warns)
    required = {r for r in doc.get("required", []) if isinstance(r, str)}
    fields = [
        _prop_field(name, ps, name in required, warns)
        for name, ps in sorted((doc.get("properties") or {}).items())
    ]
    return TableSchema(fields=fields, unknown=unknown,
                       passthrough_target=target)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def import_openapi(doc) -> tuple:
    """Import an OpenAPI v3 (structural) schema or full CRD document into
    a TableSchema. Accepts a dict, or JSON str/bytes.
    Returns (schema, warnings)."""
    if isinstance(doc, (bytes, str)):
        doc = json.loads(doc)
    if not isinstance(doc, dict):
        raise ValueError("kubeopenapi: schema document must be an object")
    root = doc
    if isinstance(root.get("openAPIV3Schema"), dict):
        root = root["openAPIV3Schema"]
    else:
        unwrapped = _unwrap_crd(root)
        if unwrapped is not None:
            root = unwrapped
    warns: list = []
    t = root.get("type")
    if t not in (None, "object"):
        warns.append(f"non-object root treated as object-compatible: type={t!r}")
    defs = _extract_defs(root)
    if defs:
        root = _resolve_refs(root, defs, warns)
    return _import_object(root, warns), warns


def import_crd_yaml(text, kind: Optional[str] = None) -> tuple:
    """Import a (possibly multi-document) CRD YAML bundle; `kind` selects
    the CRD whose spec.names.kind matches (reference ImportYAMLForCRDKind,
    kubeopenapi/yaml.go). Returns (schema, warnings)."""
    import yaml

    if isinstance(text, bytes):
        text = text.decode("utf-8")
    docs = [d for d in yaml.safe_load_all(text) if isinstance(d, dict)]
    crds = [d for d in docs if d.get("kind") == "CustomResourceDefinition"]
    if kind is not None:
        crds = [d for d in crds
                if (((d.get("spec") or {}).get("names") or {}).get("kind")) == kind]
    if not crds:
        raise ValueError(f"no CustomResourceDefinition for kind={kind!r} found")
    return import_openapi(crds[0])

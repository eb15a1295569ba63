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
format (date-time, int32/int64), allOf (deep conjunction merge — the
controller-gen `allOf: [{$ref}]` wrapper), anyOf/oneOf (first-typed-
branch adapter + ambiguity rule emitting ambiguous_match/no_match,
reference kubeopenapi/plan.go:178-211, union_ambiguity.go:13-72),
x-kubernetes-int-or-string, x-kubernetes-list-type,
x-kubernetes-list-map-keys, x-kubernetes-preserve-unknown-fields.
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
    for sub in ("allOf", "anyOf", "oneOf"):
        if isinstance(node.get(sub), list):
            node[sub] = [_resolve_refs(b, defs, warns, stack)
                         for b in node[sub]]
    return node


# --------------------------------------------------------------------------
# allOf composition (deep-merge)
# --------------------------------------------------------------------------
# controller-gen CRDs routinely wrap $refs in allOf
# (`allOf: [{$ref: ...}]`); the merge folds every branch into the node so
# the rest of the importer never sees the keyword. Constraint conflicts
# resolve to the MOST RESTRICTIVE bound (JSON-Schema allOf = conjunction).

_MERGE_MAX = {"maximum", "maxLength", "maxItems", "maxProperties"}
_MERGE_MIN = {"minimum", "minLength", "minItems", "minProperties"}


def _merge_schema(dst: dict, src: dict, warns: list, ctx: str) -> dict:
    for k, v in src.items():
        if k not in dst:
            dst[k] = v
        elif k == "properties" and isinstance(dst[k], dict) and isinstance(v, dict):
            for pk, pv in v.items():
                if pk in dst[k] and isinstance(dst[k][pk], dict) and isinstance(pv, dict):
                    dst[k][pk] = _merge_schema(dict(dst[k][pk]), pv, warns,
                                               f"{ctx}.{pk}")
                else:
                    dst[k].setdefault(pk, pv)
        elif k == "required" and isinstance(dst[k], list) and isinstance(v, list):
            dst[k] = sorted(set(dst[k]) | set(v))
        elif k in _MERGE_MAX and dst[k] != v:
            dst[k] = min(dst[k], v)   # conjunction: tighter cap wins
        elif k in _MERGE_MIN and dst[k] != v:
            dst[k] = max(dst[k], v)   # conjunction: tighter floor wins
        elif k == "enum" and dst[k] != v:
            inter = [x for x in dst[k] if x in v]
            dst[k] = inter
        elif k == "type" and dst[k] != v:
            warns.append(f"allOf at {ctx}: conflicting types "
                         f"{dst[k]!r} vs {v!r}; keeping {dst[k]!r}")
        elif k in ("items", "additionalProperties") and \
                isinstance(dst[k], dict) and isinstance(v, dict):
            dst[k] = _merge_schema(dict(dst[k]), v, warns, f"{ctx}.{k}")
        # equal values / other keys: first occurrence wins
    return dst


def _normalize_allof(node, warns: list, ctx: str = "$"):
    """Recursively fold allOf branches into their parent node."""
    if isinstance(node, list):
        return [_normalize_allof(b, warns, ctx) for b in node]
    if not isinstance(node, dict):
        return node
    node = dict(node)
    branches = node.pop("allOf", None)
    if isinstance(branches, list):
        for b in branches:
            b = _normalize_allof(b, warns, ctx)
            if isinstance(b, dict):
                node = _merge_schema(node, b, warns, ctx)
    if isinstance(node.get("properties"), dict):
        node["properties"] = {k: _normalize_allof(v, warns, f"{ctx}.{k}")
                              for k, v in node["properties"].items()}
    for sub in ("items", "additionalProperties"):
        if isinstance(node.get(sub), dict):
            node[sub] = _normalize_allof(node[sub], warns, f"{ctx}.{sub}")
    for sub in ("anyOf", "oneOf"):
        if isinstance(node.get(sub), list):
            node[sub] = [_normalize_allof(b, warns, f"{ctx}.{sub}")
                         for b in node[sub]]
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
        # OpenAPI 3.0 defaults nullable to FALSE — an explicit null is
        # only accepted when nullable: true is spelled out
        nullable=not (required and not ps.get("nullable", False)),
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
                if items.get("type") == "integer":
                    # our elem_max bound is exclusive; +1 is only valid
                    # on integer domains
                    spec.elem_max = items["maximum"] + 1
                else:
                    # number items: keep the INCLUSIVE bound (10.5 must
                    # violate maximum=10; max+1 would silently pass it)
                    spec.elem_max_incl = items["maximum"]
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
            # OpenAPI nullable defaults to false: a null map value is a
            # violation unless nullable: true is explicit
            elem = _scalar_field("value", ap, not ap.get("nullable", False), warns) \
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


def _extract_composition(ps: Any, warns: list, name: str):
    """Pull anyOf/oneOf off a property schema. Returns (ps', branches):
    ps' has the keyword removed and the FIRST TYPED branch merged in as
    the adapter type (reference plan.go:178-190 adapterForAnyOf — pick
    first typed branch; explicit keys on the node win), branches is the
    raw list (empty when no composition)."""
    if not isinstance(ps, dict):
        return ps, []
    branches = []
    for kw in ("anyOf", "oneOf"):
        b = ps.get(kw)
        if isinstance(b, list) and b:
            branches = [x for x in b if isinstance(x, dict)]
            ps = {k: v for k, v in ps.items() if k != kw}
            break
    if not branches:
        return ps, []
    typed = next((b for b in branches if b.get("type")), None)
    if typed is None:
        warns.append(f"anyOf/oneOf on {name!r} has no typed branch; "
                     "treated as string")
        ps.setdefault("type", "string")
    else:
        for k, v in typed.items():
            ps.setdefault(k, v)
    return ps, branches


def _branch_indicator(column, branch: dict, field_is_object: bool, warns, name):
    """Columnar 'value fully matches this branch' predicate
    (reference union_ambiguity.go:13-46: type branches via wire type,
    object branches via required keys, else accept). Columnar twist: the
    physical column has ONE type, so type-match means 'losslessly
    castable' — e.g. anyOf[integer,string] over a string column matches
    integer iff try_cast(bigint) succeeds, and string always."""
    from pyspark.sql import functions as F

    t = branch.get("type")
    if t and not field_is_object:
        s = column.cast("string")
        if t == "integer":
            return s.try_cast("bigint").isNotNull()
        if t == "number":
            return s.try_cast("double").isNotNull()
        if t == "boolean":
            return F.lower(s).isin("true", "false")
        if t == "string":
            return s.isNotNull()
        warns.append(f"anyOf on {name!r}: branch type {t!r} not scorable; "
                     "treated as always-matching")
        return F.lit(True)
    req = branch.get("required")
    if field_is_object and isinstance(req, list) and req:
        cond = F.lit(True)
        for k in req:
            cond = cond & column.getField(str(k)).isNotNull()
        return cond
    # reference fallback checker accepts (union_ambiguity.go:44-46)
    return F.lit(True)


def _attach_anyof_refine(sch: TableSchema, name: str, branches: list,
                         ambiguity: str, warns: list) -> None:
    """Ambiguity rule over the branch match count (reference
    union_ambiguity.go:47-72): 'error' -> matched != 1 is ambiguous_match;
    'first_match' -> matched == 0 is no_match."""
    from pyspark.sql import functions as F

    from goskema_spark.issues import Codes

    field_is_object = isinstance(sch.get(name).dtype, TableSchema)
    known = [b for b in branches
             if (b.get("type") and not field_is_object)
             or (field_is_object and b.get("required"))]
    if not known:
        return

    def matched():
        inds = [_branch_indicator(F.col(name), b, field_is_object, warns, name)
                for b in branches]
        m = F.lit(0)
        for ind in inds:
            m = m + ind.cast("int")
        return m

    if ambiguity == "first_match":
        sch.refine(
            f"anyof_{name}",
            violates=lambda: matched() == 0,
            path=f"/{name}", code=Codes.NO_MATCH,
            params=lambda: {"matched": matched()},
            when=lambda: F.col(name).isNotNull(),
        )
    else:  # 'error' (reference default AmbiguityError)
        sch.refine(
            f"anyof_{name}",
            violates=lambda: matched() != 1,
            path=f"/{name}", code=Codes.AMBIGUOUS_MATCH,
            params=lambda: {"matched": matched()},
            when=lambda: F.col(name).isNotNull(),
        )


def _import_object(doc: dict, warns: list, ambiguity: str = "error",
                   top: bool = False) -> TableSchema:
    unknown, target = _unknown_policy(doc, warns)
    required = {r for r in doc.get("required", []) if isinstance(r, str)}
    fields = []
    compositions = []
    for name, ps in sorted((doc.get("properties") or {}).items()):
        ps, branches = _extract_composition(ps, warns, name)
        fields.append(_prop_field(name, ps, name in required, warns))
        if branches:
            compositions.append((name, branches))
    sch = TableSchema(fields=fields, unknown=unknown,
                      passthrough_target=target)
    for name, branches in compositions:
        if top:
            _attach_anyof_refine(sch, name, branches, ambiguity, warns)
        else:
            # nested refinements are not compiled by the row pass;
            # the first-typed-branch adapter still applies
            warns.append(f"anyOf/oneOf on nested property {name!r}: "
                         "imported via first typed branch, ambiguity "
                         "rule attached at top level only")
    return sch


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def import_openapi(doc, ambiguity: str = "error") -> tuple:
    """Import an OpenAPI v3 (structural) schema or full CRD document into
    a TableSchema. Accepts a dict, or JSON str/bytes.

    ambiguity: anyOf/oneOf resolution strategy (reference
    kubeopenapi/options.go:43 AmbiguityStrategy) — 'error' flags
    ambiguous_match when a present value matches != 1 branch;
    'first_match' flags no_match only when no branch matches.

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
    root = _normalize_allof(root, warns)
    return _import_object(root, warns, ambiguity=ambiguity, top=True), warns


def import_crd_yaml(text, kind: Optional[str] = None,
                    ambiguity: str = "error") -> tuple:
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
    return import_openapi(crds[0], ambiguity=ambiguity)

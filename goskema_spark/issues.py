"""Issue codes, violation-row schema, message catalog, JSON-Pointer utils.

Semantic contract with the reference:
  - codes: verbatim strings from reference errors.go:10-36
  - violation row shape: Issue{Path, Code, Message, Rule, Params}
    (reference errors.go:39-54) flattened to a DataFrame row
  - messages: ported from the reference 'en' catalog
    (reference i18n/translator.go:36-57); codes without a catalog entry
    fall back to the code string itself, matching translator.go:58
  - JSON-Pointer escaping per RFC6901 (reference ref_pathref.go:51-69,
    internal/engine/enforce.go:210-221): '~' -> '~0', '/' -> '~1'
"""

from __future__ import annotations

from pyspark.sql import types as T


class Codes:
    """Reserved issue codes (reference errors.go:10-36), verbatim."""

    INVALID_TYPE = "invalid_type"
    REQUIRED = "required"
    UNKNOWN_KEY = "unknown_key"
    DUPLICATE_KEY = "duplicate_key"
    TOO_SMALL = "too_small"
    TOO_BIG = "too_big"
    TOO_SHORT = "too_short"
    TOO_LONG = "too_long"
    PATTERN = "pattern"
    INVALID_ENUM = "invalid_enum"
    INVALID_FORMAT = "invalid_format"
    DISCRIMINATOR_MISSING = "discriminator_missing"
    DISCRIMINATOR_UNKNOWN = "discriminator_unknown"
    UNION_AMBIGUOUS = "union_ambiguous"
    PARSE_ERROR = "parse_error"
    OVERFLOW = "overflow"
    TRUNCATED = "truncated"
    DOMAIN_RANGE = "domain_range"
    AGGREGATE_VIOLATION = "aggregate_violation"
    UNIQUENESS = "uniqueness"
    BUSINESS_RULE = "business_rule"
    CONFLICT = "conflict"
    DEPENDENCY_UNAVAILABLE = "dependency_unavailable"
    # k8s list-type uniqueness (reference kubeopenapi/list.go:29,63)
    DUPLICATE_ITEM = "duplicate_item"
    # anyOf/oneOf ambiguity (reference kubeopenapi/union_ambiguity.go:61,66)
    AMBIGUOUS_MATCH = "ambiguous_match"
    NO_MATCH = "no_match"


ALL_CODES = frozenset(
    v for k, v in vars(Codes).items() if not k.startswith("_") and isinstance(v, str)
)

# 'en' catalog ported from reference i18n/translator.go:36-57. Codes not
# listed fall back to the code itself (translator.go:58 returns `code`).
_EN_CATALOG = {
    Codes.INVALID_TYPE: "invalid type",
    Codes.REQUIRED: "required property missing",
    Codes.UNKNOWN_KEY: "unknown key",
    Codes.DUPLICATE_KEY: "duplicate key",
    Codes.TOO_SHORT: "too short",
    Codes.TOO_LONG: "too long",
    Codes.PARSE_ERROR: "parse error",
    Codes.TRUNCATED: "truncated",
    Codes.DEPENDENCY_UNAVAILABLE: "dependency unavailable",
}

# 'ja' catalog ported from reference i18n/translator.go:14-35.
_JA_CATALOG = {
    Codes.INVALID_TYPE: "型が不正です",
    Codes.REQUIRED: "必須プロパティが不足しています",
    Codes.UNKNOWN_KEY: "未知のキーです",
    Codes.DUPLICATE_KEY: "キーが重複しています",
    Codes.TOO_SHORT: "短すぎます",
    Codes.TOO_LONG: "長すぎます",
    Codes.PARSE_ERROR: "解析エラー",
    Codes.TRUNCATED: "打ち切られました",
    Codes.DEPENDENCY_UNAVAILABLE: "依存先サービスが利用できません",
}

_CATALOGS = {"en": _EN_CATALOG, "ja": _JA_CATALOG}

# Messages set explicitly by reference rules rather than the catalog.
# UniqueBy uses "duplicate value" (reference rules/rules.go:126).
MSG_DUPLICATE_VALUE = "duplicate value"


def message_for(code: str, lang: str = "en") -> str:
    """Catalog lookup with code-as-fallback (reference translator.go:58);
    pluggable locale like the reference Translator (translator.go:64-79)."""
    return _CATALOGS.get(lang, _EN_CATALOG).get(code, code)


# Violation row schema (FIXTURES.md F5; reference errors.go:39-54).
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.StringType(), True),
        T.StructField("path", T.StringType(), False),
        T.StructField("code", T.StringType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("rule", T.StringType(), True),
        T.StructField("params", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# The struct carried inside the per-row violations array column
# (row_id is attached when the array is exploded).
VIOLATION_STRUCT = T.StructType([f for f in VIOLATION_SCHEMA.fields if f.name != "row_id"])


def escape_pointer_token(token: str) -> str:
    """RFC6901 escaping, byte-parity with reference enforce.go:210-221."""
    return token.replace("~", "~0").replace("/", "~1")


def pointer(*tokens) -> str:
    """Build a JSON Pointer from path tokens (reference ref_pathref.go:10-77)."""
    if not tokens:
        return ""
    return "/" + "/".join(escape_pointer_token(str(t)) for t in tokens)

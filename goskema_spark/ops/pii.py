"""PII detection and redaction over the `documents` table — the standard
pre-training scrub pass (emails / phone numbers / IPv4 / SSN-shaped ids).

Every function is a pure Column-expression builder (regexp inside the
scan projection, whole-stage codegen, zero shuffles at any scale). The
patterns are deliberately RE2-safe (no backreferences, no lookaround) so
the same pattern string runs identically in Spark (java.util.regex) and
in the DuckDB (RE2) oracle; they are detectors for scrubbing, not
validators — over-matching slightly is the right failure mode for a
privacy filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# pattern order matters for redaction: emails first (an email contains
# digit runs a phone pattern could nibble at), then ip, then phone/ssn
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\+?\b\d{3}[- ]\d{3}[- ]\d{4}\b"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """{kind: count-of-matches} — one regexp_extract_all per kind."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with `<KIND>` placeholders, applied in
    PII_PATTERNS order so composite matches (email > phone) win."""
    out = text
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_profile(df: DataFrame, text_col: str = "text",
                redact: bool = True) -> DataFrame:
    """Input columns + n_<kind> counts + has_pii + (optionally) the
    redacted text. One projection over the scan."""
    t = F.col(text_col)
    counts = pii_counts(t)
    cols = [df["*"]]
    cols += [c.cast("bigint").alias(f"n_{k}") for k, c in counts.items()]
    total = None
    for k in counts:
        col = F.col(f"n_{k}")
        total = col if total is None else total + col
    out = df.select(*cols).withColumn("has_pii", total > 0)
    if redact:
        out = out.withColumn("text_redacted",
                             F.when(F.col("has_pii"), redact_pii(t))
                             .otherwise(t))
    return out

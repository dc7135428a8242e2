"""PII detection and redaction for training-data curation.

Web-scale corpora must be scrubbed of emails, IPs, and phone numbers
before training.  Both operators are pure Catalyst expressions
(regexp_count / regexp_replace — whole-stage codegen, zero Python),
and the patterns deliberately use only the regex subset that Java
(Spark) and RE2 (DuckDB/Go scrubbers) interpret identically — char
classes, bounded repetition, non-capturing groups, ``\\b`` — so the
SAME rules audit identically across engines (no backrefs, no
lookaround).

100-TB shape: a single projection over the scan — no shuffle, no
state; redaction composes with any downstream dedup/sketch pass."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: engine-portable patterns (Java regex == RE2 semantics for these)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}

#: replacement tokens, applied in PII_PATTERNS order (email first so
#: an address is never half-eaten by the ip/phone digit rules)
PII_REPLACEMENTS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def with_pii_flags(df: DataFrame, col: str = "text") -> DataFrame:
    """Append per-document PII counts ``n_email / n_ipv4 / n_phone``
    (leftmost non-overlapping matches, the shared Java/RE2 convention)
    and a ``has_pii`` flag.  NULL text counts as clean."""
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.coalesce(
                F.regexp_count(F.col(col), F.lit(pat)), F.lit(0)
            ).cast("int"),
        )
    flag = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def redact_pii(
    df: DataFrame,
    col: str = "text",
    out_col: str | None = None,
    replacements: dict[str, str] | None = None,
) -> DataFrame:
    """Replace every PII match with its placeholder token, in
    PII_PATTERNS order.  ``out_col`` defaults to replacing ``col`` in
    place.  The output is byte-deterministic: chained
    ``regexp_replace`` with leftmost non-overlapping semantics that
    Java and RE2 share, verified by the cross-engine gate query."""
    reps = {**PII_REPLACEMENTS, **(replacements or {})}
    expr = F.col(col)
    for name, pat in PII_PATTERNS.items():
        expr = F.regexp_replace(expr, F.lit(pat), F.lit(reps[name]))
    return df.withColumn(out_col or col, expr)

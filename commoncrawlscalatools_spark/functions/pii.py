"""PII detection + redaction over a text column — the scrub pass every
web-scale training-data pipeline runs before export (no reference
counterpart; LLM-pipeline extension family, same standing as the dedup /
quality-gate operators).

Design constraints:
  * One pattern string per PII kind, valid in BOTH Java regex (Spark,
    codegen'd regexp_replace/regexp_count — JVM-side, no Python in the
    row path) and RE2 (the DuckDB oracle): no lookaround, no backrefs,
    ASCII \\b word boundaries only.
  * Redaction is a fixed chain of regexp_replace calls in REDACT_ORDER —
    order is part of the contract (both engines apply the same chain), so
    ambiguous matches (a dotted phone that could half-match an IPv4)
    resolve identically everywhere.
  * Counts are taken on the ORIGINAL text (regexp_count), so a kind's
    count is independent of earlier redactions in the chain.

At 100 TB this is a pure narrow map: four codegen'd regex passes per
document, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern) in redaction order. Patterns are Java-regex AND RE2 safe.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
]

REDACT_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts on the original text (order-independent)."""
    return {kind: F.regexp_count(text, F.lit(pat)) for kind, pat in PII_PATTERNS}


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its <KIND> token, applying the kinds
    in PII_PATTERNS order (the cross-engine contract)."""
    out = text
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, REDACT_TOKENS[kind])
    return out


def with_pii_redaction(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, per-kind counts, total, redacted text) for every document.
    Narrow, shuffle-free; counts come from the pre-redaction text."""
    text = F.col(text_col)
    counts = pii_counts(text)
    total = None
    cols = [F.col(id_col)]
    for kind, _ in PII_PATTERNS:
        c = counts[kind].cast("long").alias(f"n_{kind}")
        cols.append(c)
        total = counts[kind] if total is None else total + counts[kind]
    cols.append(total.cast("long").alias("n_pii"))
    cols.append(redact_pii(text).alias("redacted_text"))
    return df.select(*cols)

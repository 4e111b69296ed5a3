"""PII detection and redaction — JVM regex, oracle-identical patterns.

Public webtext curation pipelines (C4, Dolma — public recipes) redact
personally identifiable information before training: email addresses,
IPv4 addresses, US phone numbers and SSN-shaped identifiers. This
module implements the standard pass as chained ``regexp_replace`` plus
per-kind ``regexp_count`` — all JVM-side expressions, no Python in the
hot path, zero exchanges (pure per-row projection).

Pattern portability contract: every pattern is written in the syntax
subset Java regex (Spark) and RE2 (the DuckDB oracle) evaluate
IDENTICALLY — character classes, bounded repetition, ``\\b`` on ASCII
word characters; no lookarounds (RE2 has none), no backreferences, and
no ``\\s`` (Java's includes vertical tab, RE2's does not — the one
divergence that has bitten this repo before). Counts are measured per
kind on the ORIGINAL text (independent, may overlap); redaction then
applies in the declared order.

Scale shape: a projection inside the scan task — nothing shuffles;
whole-stage codegen keeps the regex loop JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) — order is the redaction order.
#: Patterns use the Java∩RE2-identical subset (see module docstring).
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     r"\b(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
     r"(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}\b",
     "<IP>"),
    ("ssn",
     r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
     "<SSN>"),
    ("phone",
     r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
     "<PHONE>"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: "str | None" = None,
) -> DataFrame:
    """Add per-kind PII counts (``n_email``, ``n_ipv4``, ``n_ssn``,
    ``n_phone`` — counted independently on the original text) and the
    redacted text (``out_col``, default ``<text_col>_redacted``) with
    each match replaced by its placeholder in declared order."""
    out_col = out_col or f"{text_col}_redacted"
    result = df
    for kind, pattern, _ in PII_PATTERNS:
        result = result.withColumn(
            f"n_{kind}",
            F.regexp_count(F.col(text_col), F.lit(pattern)),
        )
    redacted = F.col(text_col)
    for _, pattern, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pattern, repl)
    return result.withColumn(out_col, redacted)

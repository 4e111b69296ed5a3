"""PII detection and redaction — JVM regex, oracle-identical patterns.

Public webtext curation pipelines (C4, Dolma — public recipes) redact
personally identifiable information before training: email addresses,
IPv4 addresses, US phone numbers and SSN-shaped identifiers. This
module implements the standard pass as chained ``regexp_replace`` plus
per-kind ``regexp_count`` — all JVM-side expressions, no Python in the
hot path, zero exchanges (pure per-row projection).

Pattern portability contract: boundaries are explicit digit/dot/dash
LOOKAROUNDS, not ``\\b`` — Java's ``\\b`` is Unicode-aware (a letter
like ``é`` next to a digit suppresses the boundary) while RE2's is
ASCII-only, so ``\\b`` cannot be oracle-stable and a plain pattern
without guards redacts the SUFFIX of longer digit runs. Lookarounds
rule RE2 out entirely, so the oracle is a Python ``re`` golden twin
(``tools/golden.py``): Python's lookarounds and explicit ``[0-9]``
classes evaluate identically to Java's on these patterns. Counts are
measured per kind on the ORIGINAL text (independent, may overlap);
redaction then applies in the declared order.

Scale shape: a projection inside the scan task — nothing shuffles;
whole-stage codegen keeps the regex loop JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) — order is the redaction order.
#: Patterns use the Java∩RE2-identical subset (see module docstring).
_OCTET = r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"

PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     r"(?<![0-9.])" + _OCTET + r"(\." + _OCTET + r"){3}(?![0-9.])",
     "<IP>"),
    ("ssn",
     r"(?<![0-9-])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9-])",
     "<SSN>"),
    ("phone",
     r"(?<![0-9.(-])\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}(?![0-9-])",
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

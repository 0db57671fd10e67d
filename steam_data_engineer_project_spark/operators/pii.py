"""PII detection and redaction over text columns.

Training-data pipelines scrub personally identifiable information before a
corpus ships; this is the standard regex tier (emails, IPv4 addresses,
phone-like digit runs) of that scrub.

Scale design: everything is a per-row JVM regexp expression
(regexp_count / regexp_replace — whole-stage codegen, zero shuffle, zero
Python). The patterns are deliberately RE2-compatible (no lookaround, no
backreferences) so the exact same strings run in Spark (java.util.regex),
the DuckDB oracle (RE2), and most other engines a pipeline might mirror
the scrub into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Detection patterns, in redaction order: emails first (may contain digit
#: runs), then IPv4 (dotted quads would otherwise be half-eaten by the
#: phone pattern's digit runs — dots break phone matches, but order is
#: still pinned for determinism), then phone-like runs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d -]{7,}\d",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII match counts + fully redacted text.

    Returns (id, n_email, n_ipv4, n_phone, has_pii, redacted). Counts are
    computed per pattern on the ORIGINAL text (independent detectors);
    redaction applies the patterns sequentially in PII_PATTERNS order, so a
    span claimed by an earlier pattern is never re-matched by a later one.
    """
    text = F.col(text_col)
    counts = {
        kind: F.regexp_count(text, F.lit(pat)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }
    redacted = text
    for kind, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, REDACTION_TOKENS[kind])
    has_pii = None
    for c in counts.values():
        has_pii = (c > 0) if has_pii is None else (has_pii | (c > 0))
    return df.select(
        F.col(id_col),
        *[counts[k].alias(f"n_{k}") for k in PII_PATTERNS],
        has_pii.alias("has_pii"),
        redacted.alias("redacted"),
    )

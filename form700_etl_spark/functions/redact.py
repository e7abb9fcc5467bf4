"""PII / sensitive-pattern redaction (training-data sanitization).

A scrub pass every LLM-data pipeline runs before training: mask
emails, phone numbers, SSN-shaped ids, IPs, and long digit runs from
free text.  Pure ``regexp_replace`` chains — JVM-side, codegen-
friendly, no Python in the hot path, so the same expression graph
scrubs 100 TB of shards with zero serialization overhead.

Patterns are ordered: more-specific shapes (SSN) run before the
generic digit-run catch-all so a value is labeled by the most precise
category that matches it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# label -> (java regex, replacement token); insertion order = application order
DEFAULT_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "SSN": r"\b\d{3}-\d{2}-\d{4}\b",
    "PHONE": r"\b(?:\+?1[-. ]?)?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
    "IPV4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "NUMBER_RUN": r"\b\d{8,}\b",
}


def redact_text(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Return ``col`` with every pattern occurrence replaced by
    ``[<LABEL>]``.  Application order is dict order."""
    out = F.col(col) if isinstance(col, str) else col
    for label, pat in (patterns or DEFAULT_PATTERNS).items():
        out = F.regexp_replace(out, pat, f"[{label}]")
    return out


def redaction_counts(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Total number of redactions ``redact_text`` would make, computed
    WITHOUT materializing the redacted string twice: per pattern, count
    occurrences on the progressively-scrubbed text (mirrors the
    sequential application order so overlapping patterns are not
    double-counted)."""
    cur = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for label, pat in (patterns or DEFAULT_PATTERNS).items():
        total = total + F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0))
        cur = F.regexp_replace(cur, pat, f"[{label}]")
    return total


def redact_columns(df: DataFrame, columns: list[str],
                   patterns: dict[str, str] | None = None) -> DataFrame:
    """Scrub multiple text columns in place (same schema out)."""
    for c in columns:
        df = df.withColumn(c, redact_text(c, patterns))
    return df

"""PII detection & redaction column functions (SURVEY.md §2.11 X18).

A large-scale training corpus must be scrubbed of obvious personal
identifiers before training (and GDPR/CCPA takedowns are cheaper to honor
when the identifiers never enter the corpus).  These are the standard
regex-tier scrubbers — emails, North-American phone numbers, IPv4
addresses, 16-digit card numbers — the tier every published pipeline runs
before any model-based PII pass.

Every pattern is restricted to the Java-regex ∩ RE2 common subset
(character classes, bounded repetition, ``\\b``, non-capturing groups; no
lookarounds, no backreferences) so the SAME pattern string runs in Spark
executors (Java) and the DuckDB oracle (RE2) with identical match
semantics.  Detection and redaction are plain ``regexp_extract_all`` /
``regexp_replace`` chains — JVM whole-stage codegen, zero UDFs, zero
shuffles; at 100 TB this fuses into the scan like every other text op.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered dict: redaction applies in THIS order (emails first — an email's
# local part may contain digit runs that the later numeric patterns would
# otherwise mangle mid-token).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "card": (r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def pii_count(text: Column, kind: str) -> Column:
    """# matches of one PII pattern (on the UNredacted text)."""
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def pii_total(text: Column) -> Column:
    """Total PII hits across all patterns.  Counts overlap-naively (each
    pattern scans the original text); the patterns are disjoint by
    construction on well-formed text."""
    out = None
    for kind in PII_PATTERNS:
        c = pii_count(text, kind)
        out = c if out is None else out + c
    return out


def redact(text: Column) -> Column:
    """Replace every PII match with its ``[TYPE]`` token, in the fixed
    PII_PATTERNS order."""
    out = text
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def du_pii_count(text_sql: str, kind: str) -> str:
    """DuckDB twin of :func:`pii_count` (RE2 runs the same pattern)."""
    pattern, _ = PII_PATTERNS[kind]
    esc = pattern.replace("'", "''")
    return f"len(regexp_extract_all({text_sql}, '{esc}'))"


def du_redact(text_sql: str) -> str:
    """DuckDB twin of :func:`redact` — same patterns, same order, global
    flag (DuckDB replaces only the first match without ``'g'``)."""
    out = text_sql
    for pattern, token in PII_PATTERNS.values():
        esc = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{esc}', '{token}', 'g')"
    return out

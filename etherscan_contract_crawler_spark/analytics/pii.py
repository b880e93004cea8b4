"""PII detection and redaction over a documents table — built-ins only.

A large-scale training-data pipeline must find and strip personally
identifiable information (emails, phone numbers, SSN-shaped ids, IPv4
addresses) before a corpus ships. Both operators here are pure
projections: ``regexp_count`` / ``regexp_replace`` run JVM-side inside
whole-stage codegen, zero shuffles, so they scan at parquet-read speed
at any corpus size — the 100 TB plan is identical to the 5 MB plan.

The patterns are deliberately RE2-compatible (no backreferences, no
lookaround) so the DuckDB oracle can run the very same strings; the
per-type separators are chosen disjoint (phone = 3-3-4 digit groups,
SSN = 3-2-4, IPv4 = dotted) so redaction order cannot change counts.

Reference parity note: the reference crawler stores raw scraped text
with no PII pass (crawl_contracts.py writes source verbatim) — this is
one of the beyond-reference curation operators SURVEY.md §2 adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, placeholder) — order is the redaction order. Patterns
#: must stay RE2-safe (shared verbatim with the DuckDB oracle) and
#: pairwise disjoint on well-formed inputs.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    ("ipv4", r"(?:\d{1,3}\.){3}\d{1,3}", "<IP>"),
]


def pii_signals(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII hit counts by type, total, and a has_pii flag.

    One narrow projection; the scan reads only (key, text) columns.
    """
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(pat)).cast("int")
        for name, pat, _ in PII_PATTERNS
    }
    total = None
    for name, _, _ in PII_PATTERNS:
        total = counts[name] if total is None else total + counts[name]
    return docs.select(
        F.col(key_col).alias("doc_id"),
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def pii_redact(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Replace every PII match with its typed placeholder.

    Emits the redacted text plus the redaction count so a sink can keep
    the clean text while lineage keeps the how-much-was-removed signal.
    """
    red = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    n = None
    for name, pat, _ in PII_PATTERNS:
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("int")
        n = c if n is None else n + c
    return docs.select(
        F.col(key_col).alias("doc_id"),
        red.alias("redacted_text"),
        n.alias("n_redactions"),
    )

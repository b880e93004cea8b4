"""PII detection/redaction — crafted strings with known counts.

The sf0.01 oracle check (pii_detect / pii_redact in __spark_entry__.py)
covers the engine-vs-DuckDB agreement; these tests pin the absolute
semantics: which strings ARE a phone/SSN/IP/email, the typed
placeholders, and the no-PII branch.
"""

from etherscan_contract_crawler_spark.analytics.pii import (
    PII_PATTERNS,
    pii_redact,
    pii_signals,
)


def test_pii_signals_counts(spark):
    rows = [
        (1, "reach me at bob@example.com or 555-123-4567"),
        (2, "ssn 123-45-6789 from 10.0.0.1 and 192.168.1.255"),
        (3, "nothing sensitive here"),
        (4, "two mails a@b.co and c.d@e-f.org"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in pii_signals(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["n_pii"] == 2 and out[1]["has_pii"]
    assert out[2]["n_ssn"] == 1 and out[2]["n_ipv4"] == 2
    assert out[3]["n_pii"] == 0 and not out[3]["has_pii"]
    assert out[4]["n_email"] == 2


def test_pii_types_disjoint_on_wellformed():
    """Phone (3-3-4) / SSN (3-2-4) / IPv4 (dotted) / email shapes must not
    cross-match — redaction order must never change counts."""
    import re

    samples = {
        "email": "user.name+tag@sub.example.org",
        "phone": "+555-123-4567",
        "ssn": "123-45-6789",
        "ipv4": "192.168.0.1",
    }
    for name, pat, _ in PII_PATTERNS:
        for other, s in samples.items():
            hits = len(re.findall(pat, s))
            assert hits == (1 if other == name else 0), (name, other, s)


def test_pii_redact_placeholders(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@example.com ip 10.0.0.1 ph 555-123-4567 ssn 123-45-6789")],
        ["doc_id", "text"],
    )
    r = pii_redact(df).collect()[0]
    assert r["redacted_text"] == "mail <EMAIL> ip <IP> ph <PHONE> ssn <SSN>"
    assert r["n_redactions"] == 4

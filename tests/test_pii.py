"""PII detection/redaction: per-kind patterns, counts on original
text, redaction order, and plan shape."""

from __future__ import annotations

import pandas as pd

from webscraper_spark.functions.pii import PII_PATTERNS, redact_pii


def _one(spark, text):
    df = spark.createDataFrame(
        pd.DataFrame([(0, text)], columns=["doc_id", "text"]),
        "doc_id long, text string",
    )
    return redact_pii(df).collect()[0]


def test_email(spark):
    r = _one(spark, "write to alice.smith+spam@sub.example.co today")
    assert r["n_email"] == 1
    assert r["text_redacted"] == "write to <EMAIL> today"


def test_ipv4(spark):
    r = _one(spark, "server 192.168.0.254 and 10.0.0.1 up; not 999.1.1.1")
    assert r["n_ipv4"] == 2
    assert "<IP> and <IP> up" in r["text_redacted"]
    # 999.x is not a valid octet: the 99.1.1.1 suffix isn't matched
    # either because \b anchors the first octet
    assert "999.1.1.1" in r["text_redacted"]


def test_phone_does_not_match_suffix_of_longer_runs(spark):
    """Digit-boundary lookarounds: a phone-shaped SUFFIX of a longer
    number (IDs, decimals) is not PII."""
    r = _one(spark, "ref 20555 123-4567 and pi 3.141 592-6535 ok")
    assert r["n_phone"] == 0
    assert "20555 123-4567" in r["text_redacted"]
    assert "3.141 592-6535" in r["text_redacted"]


def test_unicode_letter_adjacency_still_redacts(spark):
    """Java's \\b would suppress the match next to a non-ASCII letter;
    the explicit digit-boundary lookarounds do not — é-adjacent SSNs
    are still PII in real webtext."""
    r = _one(spark, "é123-45-6789é and café10.1.2.3")
    assert r["n_ssn"] == 1
    assert r["n_ipv4"] == 1
    assert "<SSN>" in r["text_redacted"] and "<IP>" in r["text_redacted"]


def test_ssn_and_phone_do_not_cross_match(spark):
    r = _one(spark, "ssn 123-45-6789 phone (555) 123-4567 end")
    assert r["n_ssn"] == 1
    assert r["n_phone"] == 1
    assert "<SSN>" in r["text_redacted"]
    assert "<PHONE>" in r["text_redacted"]
    assert "123-45-6789" not in r["text_redacted"]


def test_counts_are_independent_on_original_text(spark):
    # the email contains an ssn-shaped digit run; after email redaction
    # it is gone, but n_ssn counted the original
    r = _one(spark, "x 123-45-6789@mail.example.com y")
    assert r["n_email"] == 1
    assert r["n_ssn"] == 1
    assert r["text_redacted"] == "x <EMAIL> y"


def test_clean_text_passthrough(spark):
    text = "no personal data here, just words and 42 numbers"
    r = _one(spark, text)
    assert (r["n_email"], r["n_ipv4"], r["n_ssn"], r["n_phone"]) == (
        0, 0, 0, 0)
    assert r["text_redacted"] == text


def test_patterns_declared_order_is_redaction_order():
    kinds = [k for k, _, _ in PII_PATTERNS]
    assert kinds == ["email", "ipv4", "ssn", "phone"]


def test_plan_shape(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(0, "a@b.co")], columns=["doc_id", "text"]),
        "doc_id long, text string",
    )
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection, zero shuffles

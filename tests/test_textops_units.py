"""Unit pins for text-op transforms whose catalog fixtures cannot
exercise every rule (the synthetic corpus is digit- and
punctuation-free, so the PII regex stage of redacted_documents never
fires there - the oracle still hash-checks the masking stage; THIS
file feeds the regex stage real PII)."""

from __future__ import annotations


def test_redaction_regex_stage_fires_on_real_pii(spark, tmp_path):
    """URLs, emails, and long digit runs must be replaced with typed
    placeholders (in that order) and counted; blocklist terms mask
    at token level; clean text passes through unchanged."""
    import os

    from machine_downtime_monitor_on_aws_spark.plans.textops import (
        redacted_documents,
    )

    rows = [
        (1, "contact me at jane.doe+spam@example.org today", "en", "web", 44),
        (2, "see https://example.com/path?q=1 and card 1234567890", "en", "web", 52),
        (3, "the customer called the supplier twice", "en", "web", 38),
        (4, "perfectly clean text with nothing to scrub", "en", "web", 42),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(os.path.join(sf, "documents.parquet"))

    got = {r.doc_id: r for r in redacted_documents(spark, sf).collect()}
    assert got[1].redacted_text == "contact me at <EMAIL> today"
    assert got[1].n_redactions == 1
    assert got[2].redacted_text == "see <URL> and card <NUM>"
    assert got[2].n_redactions == 2
    assert got[3].redacted_text == "the <ENTITY> called the <ENTITY> twice"
    assert got[3].n_redactions == 2
    assert got[4].redacted_text == rows[3][1] and got[4].n_redactions == 0

"""PII scrubbing semantics on planted rows (the fixture corpus is
clean, so redaction correctness is asserted here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gomysql2pg_spark.operators.text import scrub_pii


def test_scrub_redacts_planted_pii(spark):
    rows = [
        (1, "contact john.doe+spam@example.co.uk for info"),
        (2, "call +1 555-123 4567 now"),
        (3, "ssn-ish 123456789 and card 4111111111111111"),
        (4, "clean text with small numbers 42 and 2024"),
        (5, "two emails a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: r["s"]
        for r in df.select("id", scrub_pii(F.col("text")).alias("s")).collect()
    }
    assert got[1] == "contact <EMAIL> for info"
    assert got[2] == "call <PHONE> now"
    assert got[3] == "ssn-ish <NUM> and card <NUM>"
    assert got[4] == "clean text with small numbers 42 and 2024"
    assert got[5] == "two emails <EMAIL> <EMAIL>"

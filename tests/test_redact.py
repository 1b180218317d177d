"""PII redaction tests: masking, ordered-pass semantics, counts."""

from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.functions import redact


def _col(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_email_ipv4_phone_masked(spark):
    out = _col(
        spark,
        "mail me at jane.doe+spam@sub.example.co.uk from 10.0.255.7 "
        "or call +1 (555) 123-4567 today",
        redact.redact_pii(F.col("text")),
    )
    assert out == "mail me at [email] from [ipv4] or call [phone] today"


def test_ipv4_not_double_counted_as_phone(spark):
    # the dotted quad would match the loose phone pattern if ipv4 did not
    # mask it first
    text = "server 192.168.001.100 is up"
    assert _col(spark, text, redact.redact_pii(F.col("text"))) == (
        "server [ipv4] is up"
    )
    assert _col(spark, text, redact.pii_count(F.col("text"), "phone")) == 0
    assert _col(spark, text, redact.pii_count(F.col("text"), "ipv4")) == 1


def test_counts_multiple(spark):
    text = "a@b.io c@d.org and 1.2.3.4 plus 555 123 4567 end"
    assert _col(spark, text, redact.pii_count(F.col("text"), "email")) == 2
    assert _col(spark, text, redact.pii_count(F.col("text"), "ipv4")) == 1
    assert _col(spark, text, redact.pii_count(F.col("text"), "phone")) == 1


def test_clean_text_unchanged(spark):
    text = "no personal information here, just words and the number 42"
    assert _col(spark, text, redact.redact_pii(F.col("text"))) == text

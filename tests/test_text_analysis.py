"""Text-analysis column-function tests (language ID, quality, fingerprint)."""

import pytest
from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.functions import text_analysis as ta


def _df(spark):
    rows = [
        (1, "the cat and the dog sat in that house with it"),
        (2, "der Hund ist nicht ein Tier und das ist gut"),
        (3, "le chat est dans la maison et les oiseaux"),
        (4, "zzz qqq xxx"),
        (5, "Hello,   World!  Hello\tagain."),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_lang_id(spark):
    got = {
        r["id"]: r["lang"]
        for r in _df(spark).select("id", ta.lang_id(F.col("text")).alias("lang")).collect()
    }
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "unk"


def test_token_counts(spark):
    r = (
        _df(spark)
        .filter("id = 5")
        .select(
            ta.token_count_ws(F.col("text")).alias("ws"),
            ta.token_count_words(F.col("text")).alias("words"),
        )
        .head()
    )
    assert r["ws"] == 4  # Hello, World! Hello again.
    assert r["words"] == 4


def test_punct_and_quality(spark):
    rows = {
        r["id"]: r
        for r in _df(spark)
        .select(
            "id",
            ta.punct_ratio(F.col("text")).alias("punct"),
            ta.quality_score(F.col("text")).alias("q"),
        )
        .collect()
    }
    assert rows[1]["punct"] == 0.0
    assert rows[5]["punct"] > 0.0
    assert 0.0 <= rows[4]["q"] <= 1.0
    assert rows[1]["q"] > rows[4]["q"]  # real sentence beats gibberish


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, " HELLO\tWORLD ")],
        "id long, text string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", ta.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert len(fps[1]) == 32

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


def test_repetition_signals_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 4 lines, "menu home" twice -> 1/4 dup lines; words:
            # [menu home menu home about us contact us] -> 8 tokens,
            # 5 distinct -> dup_word 3/8; trigrams: 6 total, all distinct
            # except "menu home menu" appears once... compute below
            (1, "menu home\nabout us\nmenu home\ncontact us"),
            # no repetition at all
            (2, "one two three four five"),
            # pure loop: "spam spam spam spam"
            (3, "spam spam spam spam"),
            # shorter than n tokens -> zero ngrams, ratio 0
            (4, "tiny doc"),
            ("5", ""),  # empty text -> all ratios 0
            # CRLF page: the \r-edged first line must match its duplicate
            ("6", "menu home\r\nmenu home"),
        ],
        "id string, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            ta.dup_line_ratio(F.col("text")).alias("dl"),
            ta.dup_word_ratio(F.col("text")).alias("dw"),
            ta.dup_ngram_ratio(F.col("text"), 3).alias("dn"),
        ).collect()
    }

    def py_ref(text, n=3):
        import re

        lines = [x.strip() for x in text.split("\n") if x.strip()]
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

        def dup(a):
            return 0.0 if not a else 1.0 - len(set(a)) / len(a)

        return dup(lines), dup(toks), dup(grams)

    for rid, text in [
        ("1", "menu home\nabout us\nmenu home\ncontact us"),
        ("2", "one two three four five"),
        ("3", "spam spam spam spam"),
        ("4", "tiny doc"),
        ("5", ""),
        ("6", "menu home\r\nmenu home"),
    ]:
        dl, dw, dn = py_ref(text)
        assert abs(rows[rid]["dl"] - dl) < 1e-12, (rid, "line")
        assert abs(rows[rid]["dw"] - dw) < 1e-12, (rid, "word")
        assert abs(rows[rid]["dn"] - dn) < 1e-12, (rid, "ngram")
    # the loop page is maximally repetitive, the clean page not at all
    assert rows["3"]["dw"] == 0.75 and rows["2"]["dw"] == 0.0
    assert rows["3"]["dn"] == 0.5  # [spam spam spam] x2 -> 1 dup of 2

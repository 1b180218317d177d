"""Analyzer-chain unit tests: Porter guards, delimiter alphabets, pipeline order.

Pins the semantics cloned from `T/lexicalAnalysis/Stemmer.java:26-34`,
`T/.../S2TextualEntryTokens.java:55-105`, `T/ui/Search.java:36,185-238`.
"""

import pytest

from search_engine_trec_fair_ranking_19_spark.analysis.porter import porter_stem, stem
from search_engine_trec_fair_ranking_19_spark.analysis.stopwords import STOPWORDS, is_stopword
from search_engine_trec_fair_ranking_19_spark.analysis.tokenizer import (
    analyze_query,
    analyze_text,
    split_query,
    split_text,
    tf_map,
)

# Martin Porter's published example outputs for the canonical algorithm
PORTER_CASES = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
    ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"), ("rational", "ration"),
    ("digitizer", "digit"), ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("formative", "form"), ("formalize", "formal"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("adjustable", "adjust"), ("defensible", "defens"),
    ("replacement", "replac"), ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("effective", "effect"), ("rate", "rate"),
    ("cease", "ceas"), ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", PORTER_CASES)
def test_porter_known_values(word, expected):
    assert porter_stem(word) == expected


def test_stemmer_guards():
    # len <= 3: never stemmed (Stemmer.java:27)
    assert stem("ran") == "ran"
    assert stem("bee") == "bee"
    # stem shorter than 3 chars: rolled back (Stemmer.java:29-31)
    assert porter_stem("ties") == "ti"
    assert stem("ties") == "ties"
    # normal path
    assert stem("running") == "run"


def test_stem_before_lowercase_order():
    # "RUNNING" has no lowercase suffix match -> survives stemming, then lowered
    assert analyze_text("RUNNING", use_stopwords=False) == ["running"]
    assert analyze_text("running", use_stopwords=False) == ["run"]
    # mixed case where the tail is lowercase still stems
    assert analyze_text("Running", use_stopwords=False) == ["run"]


def test_stopwords_mixed_case():
    assert is_stopword("The") and is_stopword("the") and is_stopword("AND")
    assert not is_stopword("spark")
    assert analyze_text("The Quick") == ["quick"]
    assert len(STOPWORDS) > 700


def test_build_delimiters_unicode():
    # exotic delimiters from S2TextualEntryTokens.java:83-93
    assert split_text("alpha—beta–gamma−delta") == ["alpha", "beta", "gamma", "delta"]
    assert split_text("a“b”c，d") == ["a", "b", "c", "d"]
    assert split_text("soft­hyphen zero​width") == [
        "soft", "hyphen", "zero", "width",
    ]
    assert split_text("") == []
    assert split_text("...") == []


def test_query_vs_build_delimiters_differ():
    # ';' splits build-side but NOT query-side (Search.java:36)
    assert split_text("a;b") == ["a", "b"]
    assert split_query("a;b") == ["a;b"]
    # '-' and '.' split on both sides
    assert split_query("x-y.z") == ["x", "y", "z"]


def test_analyze_query_pipeline():
    assert analyze_query("the running COMPUTERS") == ["run", "computers"]
    assert analyze_query("") == []


def test_tf_map():
    m = tf_map("dog dog cat the THE Dogs", use_stemmer=True, use_stopwords=True)
    assert m == {"dog": 3, "cat": 1}

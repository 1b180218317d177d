"""E2 WordNet expansion — real wndb(5) reader + reference candidate
semantics (`WordNet.java:52-137`), pinned against a synthetic mini-database
written in the same public file format."""

import pytest

from search_engine_trec_fair_ranking_19_spark.analysis.expansion import (
    expand_query,
)
from search_engine_trec_fair_ranking_19_spark.analysis.wordnet import (
    PENN_TO_WN,
    WordNetDictionary,
    WordNetExpander,
    rule_tag,
)

_LICENSE = "  1 This synthetic header line mimics the wndb license block.\n"


def _write(path, name, lines):
    (path / name).write_text(_LICENSE + "".join(l + "  \n" for l in lines))


@pytest.fixture()
def mini_dict(tmp_path):
    """A 4-POS mini WordNet in wndb(5) format: index lines carry real
    synset_cnt/p_cnt/ptr fields (the parser must skip past a variable-width
    pointer-symbol list), data lines carry hex w_cnt, multiword lemmas with
    underscores, a stopword member, and an adjective syntactic marker."""
    d = tmp_path / "dict"
    d.mkdir()
    _write(d, "index.noun", [
        "engine n 2 1 @ 2 1 00001740 00002050",
        "car n 1 2 @ ~ 1 1 00003130",
        "data n 1 0 1 0 00004460",
    ])
    _write(d, "data.noun", [
        "00001740 03 n 04 engine 0 motor 0 locomotive 0 railway_locomotive 0 "
        "001 @ 00001930 n 0000 | machine that converts energy",
        "00002050 03 n 03 engine 0 the 0 contraption 0 000 | with a stopword",
        "00003130 03 n 03 car 0 motor_car 0 auto 0 000 | a motor vehicle",
        "00004460 03 n 02 data 0 information 0 000 | facts",
    ])
    _write(d, "index.verb", [
        "run v 1 0 1 0 00005810",
    ])
    _write(d, "data.verb", [
        "00005810 30 v 02 run 0 sprint 0 000 | move fast",
    ])
    _write(d, "index.adj", [
        "abundant a 1 0 1 0 00006780",
    ])
    _write(d, "data.adj", [
        "00006780 00 a 02 galore(ip) 0 abundant 0 000 | plentiful",
    ])
    _write(d, "index.adv", [
        "fast r 1 0 1 0 00007890",
    ])
    _write(d, "data.adv", [
        "00007890 02 r 02 fast 0 quickly 0 000 | at speed",
    ])
    return str(d)


def test_missing_dict_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        WordNetExpander(str(tmp_path / "nope"))


def test_index_parse_sense_order_and_pointer_skip(mini_dict):
    wn = WordNetDictionary(mini_dict)
    # "engine": p_cnt=1 pointer symbol to skip; two senses in stored order
    assert wn.get_index_word("n", "engine") == [1740, 2050]
    # "car": p_cnt=2
    assert wn.get_index_word("n", "car") == [3130]
    assert wn.get_index_word("n", "absent") is None
    # multiword lookups go through underscore normalization
    assert wn.get_index_word("n", "Motor Car") is None  # not an index entry


def test_data_parse_lemmas_spaces_and_markers(mini_dict):
    wn = WordNetDictionary(mini_dict)
    assert wn.synset_words("n", 1740) == [
        "engine", "motor", "locomotive", "railway locomotive",
    ]
    # adjective syntactic marker "(ip)" stripped, as extjwnl getLemma() does
    assert wn.synset_words("a", 6780) == ["galore", "abundant"]


def test_expand_per_synset_cap_and_stopword_skip(mini_dict):
    exp = WordNetExpander(mini_dict)  # rule_tag tags "engine" NN → noun
    # synset 1740: cap of 3 cuts "railway locomotive";
    # synset 2050: "the" is a stopword, skipped WITHOUT counting
    # (WordNet.java:90-92), so "contraption" still emits; the original
    # lemma re-appears per synset (no dedup at this level — E3's job).
    assert exp.expand("engine") == [
        "engine", "motor", "locomotive", "engine", "contraption",
    ]


def test_expand_pos_routing(mini_dict):
    noun = WordNetExpander(mini_dict)
    # rule_tag defaults "run" to NN; no index.noun entry → no expansion
    # (WordNet.java:83-84)
    assert noun.expand("run") == []
    verb = WordNetExpander(mini_dict, tagger=lambda toks: ["VB"] * len(toks))
    assert verb.expand("run") == ["run", "sprint"]
    adj = WordNetExpander(mini_dict, tagger=lambda toks: ["JJ"] * len(toks))
    assert adj.expand("abundant") == ["galore", "abundant"]
    adv = WordNetExpander(mini_dict, tagger=lambda toks: ["RB"] * len(toks))
    assert adv.expand("fast") == ["fast", "quickly"]
    # null POS → original kept with no expansions (WordNet.java:81)
    assert noun.expand("42") == []


def test_expand_query_end_to_end(mini_dict):
    exp = WordNetExpander(mini_dict)
    # E3 over the WordNet candidates: original "engine" stems to "engin";
    # the synset's own "engine" dedupes against the last emitted term;
    # "motor" survives as the single kept expansion (≤1 incl. original).
    assert expand_query("engine", exp) == [("engin", 1.0), ("motor", 0.5)]
    # multiword lemma "motor car" dropped by E3 (Search.java:250-253),
    # "auto" takes the expansion slot
    assert expand_query("car", exp) == [("car", 1.0), ("auto", 0.5)]
    # stopword original drops the token entirely, expansions included
    assert expand_query("the engine", exp) == [("engin", 1.0), ("motor", 0.5)]
    # numeric token: null POS keeps the original, unexpanded
    assert expand_query("engine 42", exp) == [
        ("engin", 1.0), ("motor", 0.5), ("42", 1.0),
    ]


def test_rule_tagger_classes():
    assert rule_tag(["the", "engines", "ran", "quickly", "42", "beautiful"])[
        0:6
    ] == ["DT", "NNS", "NN", "RB", "CD", "JJ"]
    # every emitted tag maps into PENN_TO_WN or to a null-POS class
    for tag in rule_tag(["running", "jumped", "is", "must", "data"]):
        assert tag in PENN_TO_WN or tag in {
            "DT", "PRP", "PRP$", "IN", "CC", "TO", "MD", "CD", "SYM",
        }

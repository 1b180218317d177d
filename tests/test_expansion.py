"""Query-expansion (E1-E3) semantics + Spark/oracle parity.

The E3 filter chain (`Search.java:241-269`): per token the candidate list is
[original, expansions...]; stopword + multiword candidates dropped; at most
TWO terms kept per token INCLUDING the original (termCount counts the
original, `Search.java:264-266`); dedup only vs the immediately preceding
emitted term (`Search.java:260`); stopword ORIGINALS are skipped entirely by
the expanders (`GloVe.java:60-62`); expansion weight 0.5.
"""

import pytest

from search_engine_trec_fair_ranking_19_spark.analysis.expansion import (
    GloVeExpander,
    SynonymTableExpander,
    WordNetExpander,
    expand_query,
)
from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
from search_engine_trec_fair_ranking_19_spark.operators import query as q
from search_engine_trec_fair_ranking_19_spark.operators.index_build import build_index
from search_engine_trec_fair_ranking_19_spark.oracle import engine as oracle
from search_engine_trec_fair_ranking_19_spark.sources.webtext import (
    corpus_pandas,
    corpus_spark,
)


def test_no_expander_equals_plain_analyze():
    got = expand_query("Running quickly", None)
    assert got == [("run", 1.0), ("quickli", 1.0)]


def test_expansion_weight_and_cap():
    exp = SynonymTableExpander({"web": ["net", "online", "internet", "www"]})
    got = expand_query("web", exp, use_stemmer=False)
    # termCount counts the ORIGINAL too and breaks at 2 (Search.java:264-266):
    # at most ONE expansion survives per token
    assert got == [("web", 1.0), ("net", 0.5)]


def test_multiword_expansions_dropped():
    exp = SynonymTableExpander({"web": ["world wide web", "net", "the net", "www"]})
    got = expand_query("web", exp, use_stemmer=False)
    # multiword candidates are dropped BEFORE counting (Search.java:250-253),
    # so "net" still makes it in as the single kept expansion
    assert got == [("web", 1.0), ("net", 0.5)]


def test_expansion_dedup_vs_last_emitted_only():
    exp = SynonymTableExpander({"web": ["search", "net"], "search": ["web", "find"]})
    got = expand_query("web search", exp, use_stemmer=False)
    # dedup is only vs the LAST emitted term (newQuery.get(size-1),
    # Search.java:260): "web" as an expansion of "search" is NOT suppressed
    # (last emitted at that point is "search"); mergeTerms (A9) then sums
    assert got == [
        ("web", 1.0), ("search", 0.5),
        ("search", 1.0), ("web", 0.5),
    ]
    merged = oracle.merge_terms(got)
    assert ("search", 1.5) in merged and ("web", 1.5) in merged


def test_expansion_duplicate_allowed_when_not_adjacent():
    # the same expansion may appear under two tokens — dedup never looks
    # further back than one emitted term
    exp = SynonymTableExpander({"web": ["net"], "site": ["net"]})
    got = expand_query("web site", exp, use_stemmer=False)
    assert got == [("web", 1.0), ("net", 0.5), ("site", 1.0), ("net", 0.5)]


def test_expansion_adjacent_duplicate_suppressed():
    exp = SynonymTableExpander({"web": ["web", "net"]})
    got = expand_query("web", exp, use_stemmer=False)
    # candidate "web" equals the last emitted term -> skipped; "net" kept
    assert got == [("web", 1.0), ("net", 0.5)]


def test_stopword_original_drops_expansions_too():
    # GloVe.java:60-62 / WordNet.java:72-74: a stopword original never emits
    # its candidate list at all
    exp = SynonymTableExpander({"the": ["thesis", "theta"], "web": ["net"]})
    got = expand_query("the web", exp, use_stemmer=False)
    assert got == [("web", 1.0), ("net", 0.5)]


def test_pos_guard_blocks_non_content_tokens():
    # WordNet.java:81-99,115-137: only N/V/ADJ/ADV tokens are expanded; a
    # null-POS token (number/symbol — here approximated as non-alphabetic)
    # keeps its original with NO expansions
    exp = SynonymTableExpander({"w00001": ["w00002"], "web": ["net"]})
    got = expand_query("w00001 web", exp, use_stemmer=False)
    assert got == [("w00001", 1.0), ("web", 1.0), ("net", 0.5)]


def test_expansion_normalized_like_originals():
    exp = SynonymTableExpander({"fast": ["Running", "the"]})
    got = expand_query("fast", exp)  # stemmer+stopwords on
    # "Running" stems (original case) then lowercases; "the" is a stopword
    assert got == [("fast", 1.0), ("run", 0.5)]


def test_external_model_missing_files_raise():
    # both user-supplied-artifact expanders fail loudly on missing inputs
    with pytest.raises(FileNotFoundError):
        GloVeExpander("/nonexistent/glove.txt")
    with pytest.raises(FileNotFoundError):
        WordNetExpander("/nonexistent/wordnet/dict")


def _write_glove(tmp_path, rows):
    p = tmp_path / "vectors.txt"
    p.write_text(
        "\n".join(w + " " + " ".join(str(x) for x in v) for w, v in rows) + "\n",
        encoding="utf-8",
    )
    return str(p)


def test_glove_expander_nearest_by_cosine(tmp_path):
    # GloVe.java:52-80: wordsNearest(token, 3) by cosine over the model file
    path = _write_glove(
        tmp_path,
        [
            ("web", [1.0, 0.0]),
            ("net", [0.9962, 0.0872]),   # cos ~0.996 vs web
            ("site", [0.866, 0.5]),      # cos 0.866
            ("page", [0.7071, 0.7071]),  # cos ~0.707
            ("the", [0.0, 1.0]),         # cos 0
        ],
    )
    exp = GloVeExpander(path)
    assert exp.expand("web") == ["net", "site", "page"]
    # case-insensitive lookup, like the lowercase public GloVe vocab
    assert exp.expand("WEB") == ["net", "site", "page"]
    # OOV token: no candidates (the original survives unexpanded upstream)
    assert exp.expand("zzz") == []


def test_glove_expander_tie_break_by_word(tmp_path):
    # equal cosines order by word asc — deterministic across runs
    path = _write_glove(
        tmp_path,
        [
            ("web", [1.0, 0.0]),
            ("beta", [0.5, 0.5]),
            ("alpha", [0.5, 0.5]),
            ("gamma", [0.5, 0.5]),
            ("far", [0.0, 1.0]),
        ],
    )
    exp = GloVeExpander(path)
    assert exp.expand("web") == ["alpha", "beta", "gamma"]


def test_glove_expander_end_to_end_pipeline(tmp_path):
    # full E1+E3: vectors file -> nearest-3 -> stopword/multiword/cap filters
    path = _write_glove(
        tmp_path,
        [
            ("web", [1.0, 0.0]),
            ("the", [0.999, 0.01]),      # nearest, but a stopword: dropped
            ("networks", [0.99, 0.05]),  # kept, stemmed to "network"
            ("site", [0.9, 0.3]),        # capped out (1 expansion max)
            ("query", [0.0, 1.0]),
        ],
    )
    got = expand_query("web", GloVeExpander(path))
    assert got == [("web", 1.0), ("network", 0.5)]


CFG = EngineConfig(postings_block_size=64)


def test_expanded_bm25_parity_spark_vs_oracle(spark, tmp_path):
    n = 250
    pdf = corpus_pandas(n, seed=23)
    docs = list(zip(pdf["url"], pdf["text"]))
    oidx = oracle.build_index(docs, CFG)
    webtext = corpus_spark(spark, n, seed=23, n_partitions=4)
    t = build_index(spark, webtext, str(tmp_path / "expidx"), CFG)

    exp = SynonymTableExpander(
        {"web": ["page", "site"], "search": ["query", "find"]}
    )
    want = oracle.bm25_topk(oidx, "web search", k=15, expander=exp)
    got = q.bm25_topk(spark, t, "web search", k=15, expander=exp)
    rows = [(r["docid"], r["score"]) for r in got.collect()]
    assert [d for d, _ in rows] == [d for d, _ in want]
    for (gd, gs), (_, es) in zip(rows, want):
        assert gs == pytest.approx(es, abs=1e-9)
    # expansion must actually change the result vs unexpanded
    plain = oracle.bm25_topk(oidx, "web search", k=15)
    assert [d for d, _ in plain] != [d for d, _ in want] or plain != want

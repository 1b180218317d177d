"""Pure-Python oracle pinned to hand-computed values (SURVEY.md §5).

The oracle is the correctness anchor for the Spark engine, so its own math is
verified here against values computed by hand from the reference formulas
(`OkapiBM25P.java:67-99`, `VSM.java:52-107`, `ThemisEval.java:207-271`,
`Pagerank.java:214-277`).
"""

import math

import pytest

from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
from search_engine_trec_fair_ranking_19_spark.oracle.engine import (
    average_precision,
    bm25_topk,
    build_index,
    existential,
    merge_terms,
    ndcg,
    pagerank,
    vsm_topk,
)

# stemming/stopwords off so terms are predictable
CFG = EngineConfig(use_stemmer=False, use_stopwords=False)

DOCS = [
    ("u1", "apple banana apple"),
    ("u2", "banana cherry"),
    ("u3", "apple apple apple cherry"),
    ("u4", "durian"),
]


@pytest.fixture(scope="module")
def index():
    return build_index(DOCS, CFG)


def test_index_stats(index):
    assert index.n_docs == 4
    assert index.avgdl == (3 + 2 + 4 + 1) / 4
    assert index.df == {"apple": 2, "banana": 2, "cherry": 2, "durian": 1}
    # docids are 1-based rank of url ascending
    assert index.doc_id_of_url == {"u1": 1, "u2": 2, "u3": 3, "u4": 4}
    assert index.postings["apple"] == [(1, 2), (3, 3)]
    assert index.max_tf == {1: 2, 2: 1, 3: 3, 4: 1}


def test_bm25_hand_computed(index):
    # query "apple" (single term): idf = ln(4/3); B = 2*(1-.75+.75*dl/2.5)
    # doc1: f=2, dl=3  -> s1 = idf*(2*3/(2+B1) + 1),  B1 = 2*(0.25+0.75*3/2.5)
    # doc3: f=3, dl=4  -> s3 = idf*(3*3/(3+B3) + 1),  B3 = 2*(0.25+0.75*4/2.5)
    idf = math.log(4 / 3)
    B1 = 2 * (0.25 + 0.75 * 3 / 2.5)
    B3 = 2 * (0.25 + 0.75 * 4 / 2.5)
    s1 = idf * (2 * 3 / (2 + B1) + 1)
    s3 = idf * (3 * 3 / (3 + B3) + 1)
    expected = sorted(
        [(1, s1 / max(s1, s3)), (3, s3 / max(s1, s3))], key=lambda r: -r[1]
    )
    got = bm25_topk(index, "apple")
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gs == pytest.approx(es, abs=1e-12)


def test_bm25_unmatched_term_adds_idf(index):
    # two-term query: doc4 matches only "durian" but still receives idf("apple")
    got = dict(bm25_topk(index, "apple durian"))
    assert 4 in got and 1 in got and 3 in got
    # doc4 raw = idf_d*(f/(f+B)+...)+idf_a ; verify via raw recomputation
    idf_a = math.log(4 / 3)
    idf_d = math.log(4 / 2)
    B4 = 2 * (0.25 + 0.75 * 1 / 2.5)
    raw4 = idf_d * (1 * 3 / (1 + B4)) + idf_d + idf_a
    B1 = 2 * (0.25 + 0.75 * 3 / 2.5)
    raw1 = idf_a * (2 * 3 / (2 + B1)) + idf_a + idf_d
    B3 = 2 * (0.25 + 0.75 * 4 / 2.5)
    raw3 = idf_a * (3 * 3 / (3 + B3)) + idf_a + idf_d
    mx = max(raw1, raw3, raw4)
    assert got[4] == pytest.approx(raw4 / mx, abs=1e-12)
    assert got[1] == pytest.approx(raw1 / mx, abs=1e-12)


def test_merge_terms():
    merged = merge_terms([("a", 1.0), ("b", 1.0), ("a", 1.0), ("a", 0.5)])
    assert merged == [("a", 2.5), ("b", 1.0)]


def test_tie_break_ascending_docid():
    docs = [("a", "same text"), ("b", "same text"), ("c", "same text")]
    idx = build_index(docs, CFG)
    got = bm25_topk(idx, "same")
    assert [d for d, _ in got] == [1, 2, 3]  # equal scores -> ascending docid
    # DF == N makes idf = ln(3/4) < 0, so maxScore stays at its 0 init and is
    # forced to 1 (OkapiBM25P.java:91-94): scores remain raw (and negative here)
    assert len({s for _, s in got}) == 1
    assert all(s < 0 for _, s in got)


def test_existential(index):
    got = existential(index, "apple durian zzz")
    assert [(d, s) for d, s in got] == [(1, 1.0), (3, 1.0), (4, 1.0)]


def test_vsm_single_term(index):
    # single-term query: scores ∝ (tf/maxTF)·idf² / vsm_weight; max-normalized
    got = dict(vsm_topk(index, "apple"))
    assert set(got) == {1, 3}
    idf_q = math.log(4 / 3)
    w1 = (2 / 2) * idf_q
    w3 = (3 / 3) * idf_q
    s1 = (idf_q * w1) / (index.vsm_weight[1] * idf_q)
    s3 = (idf_q * w3) / (index.vsm_weight[3] * idf_q)
    mx = max(s1, s3)
    assert got[1] == pytest.approx(s1 / mx, abs=1e-12)
    assert got[3] == pytest.approx(s3 / mx, abs=1e-12)


def test_average_precision_hand():
    # ranked: R N R over judged, 3 relevant total (one never retrieved)
    rel = {"a": 1, "b": 0, "c": 1, "d": 1}
    ranked = ["a", "x", "b", "c"]  # x unjudged -> skipped entirely
    # judged seq: a(rel,1/1), b(non), c(rel,2/3); AP = (1 + 2/3)/3
    assert average_precision(ranked, rel) == pytest.approx((1 + 2 / 3) / 3)
    assert math.isnan(average_precision(ranked, {"a": 0}))


def test_ndcg_hand():
    rel = {"a": 1, "b": 0, "c": 1}
    ranked = ["b", "a", "c"]
    # judged ranks: b@1(0), a@2(rel), c@3(rel); dcg = ln2/ln3 + ln2/ln4
    dcg = math.log(2) / math.log(3) + math.log(2) / math.log(4)
    idcg = math.log(2) / math.log(2) + math.log(2) / math.log(3)
    assert ndcg(ranked, rel) == pytest.approx(dcg / idcg)


def test_pagerank_uniform_cycle():
    # 3-cycle: stationary distribution is uniform regardless of damping
    docs = [("a", "x"), ("b", "x"), ("c", "x")]
    idx = build_index(docs, CFG)
    links = {"a": ["b"], "b": ["c"], "c": ["a"]}
    pr = pagerank(idx, links)
    for v in pr.values():
        assert v == pytest.approx(1 / 3, abs=1e-6)
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_cleaning():
    docs = [("a", "x"), ("b", "x")]
    idx = build_index(docs, CFG)
    # self-loop, duplicate, dangling target -> all cleaned; a->b only
    links = {"a": ["a", "b", "b", "nope"], "b": []}
    pr = pagerank(idx, links)
    assert pr[2] > pr[1]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-4)

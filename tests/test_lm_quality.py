"""Bigram-LM perplexity quality scoring: exactness vs a pure-Python
reference, the ranking property the filter exists for, and plan hygiene."""

import math

import pytest
from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.operators import lm_quality


def _py_lm(train_texts):
    """Independent reimplementation of fit + score (lists and dicts)."""
    import re

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    uni, big = {}, {}
    for t in train_texts:
        ws = toks(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for u, v in zip(ws, ws[1:]):
            big[(u, v)] = big.get((u, v), 0) + 1
    T, V = sum(uni.values()), len(uni)
    denom = T + lm_quality.ALPHA * V

    def score(text):
        ws = toks(text)
        if len(ws) < 2:
            return None
        nlls = []
        for u, v in zip(ws, ws[1:]):
            p_big = big.get((u, v), 0) / uni[u] if u in uni else 0.0
            p_uni = (uni.get(v, 0) + lm_quality.ALPHA) / denom
            p = lm_quality.LAMBDA * p_big + (1.0 - lm_quality.LAMBDA) * p_uni
            nlls.append(-math.log2(p))
        return len(nlls), sum(nlls) / len(nlls)

    return score


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
    "the mat and the rug",
    "cats and dogs sit",
]


@pytest.fixture(scope="module")
def fitted(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id long, text string"
    )
    return df, lm_quality.fit_bigram_lm(df)


def test_matches_python_reference(spark, fitted):
    df, model = fitted
    got = {
        r["doc_id"]: (r["n_transitions"], r["log2_ppl"])
        for r in lm_quality.lm_score(df, model).collect()
    }
    ref = _py_lm(TRAIN)
    for i, t in enumerate(TRAIN):
        n, nll = ref(t)
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(nll, abs=1e-9)


def test_in_domain_beats_garbage(spark, fitted):
    """The filter's raison d'être: text drawn from the training distribution
    scores strictly lower perplexity than OOV garbage and than the same
    vocabulary in scrambled order."""
    _, model = fitted
    probes = spark.createDataFrame(
        [
            (1, "the cat sat on the rug"),        # in-domain
            (2, "mat the on sat rug dog the"),    # same vocab, broken bigrams
            (3, "zorp blix quux flemp zzyzx wubble"),  # fully OOV
        ],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["log2_ppl"] for r in lm_quality.lm_score(probes, model).collect()}
    assert s[1] < s[2] < s[3]


def test_short_and_oov_edges(spark, fitted):
    _, model = fitted
    probes = spark.createDataFrame(
        [(1, "cat"), (2, ""), (3, "  !! ?? "), (4, "zorp zorp")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in lm_quality.lm_score(probes, model).collect()}
    # <2 word tokens -> unscored
    assert set(rows) == {4}
    # fully-OOV transition: p = (1-LAMBDA) * oov floor, finite and exact
    want = -math.log2((1.0 - lm_quality.LAMBDA) * model.oov_prob)
    assert rows[4]["log2_ppl"] == pytest.approx(want, abs=1e-9)


def test_score_plan_is_jvm_only(spark, fitted):
    df, model = fitted
    plan = (
        lm_quality.lm_score(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert marker not in plan, plan

"""Property tests for the webtext-hygiene family (urls, redact,
decontaminate, repetition signals) against pure-Python references.

The contract under test is the same engine-independence the sampling
family pins: every function is a pure function of the row, so a Python
reimplementation must agree on arbitrary inputs — not just the fixture
strings the example tests use. One Spark job per hypothesis example,
small example budgets."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.functions import (
    text_analysis as ta,
)
from search_engine_trec_fair_ranking_19_spark.functions import urls
from search_engine_trec_fair_ranking_19_spark.operators import (
    decontaminate as dc,
)

# URL pieces: generate structured-but-messy URLs rather than raw text —
# raw noise almost never parses, structured noise exercises every branch
_scheme = st.sampled_from(["http", "HTTPS", "ftp", "hTTp"])
_host = st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,3}", fullmatch=True)
_param = st.one_of(
    st.from_regex(r"[a-z]{1,6}=[A-Za-z0-9+]{0,6}", fullmatch=True),
    st.from_regex(r"utm_[a-z]{1,8}=[A-Za-z0-9]{0,6}", fullmatch=True),
    st.sampled_from(["fbclid=x1Y", "gclid=Z", "msclkid=q", "utm_source"]),
)
_frag = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9?&=]{0,10}", fullmatch=True))


@st.composite
def _urls(draw):
    q = draw(st.lists(_param, min_size=0, max_size=5))
    return (
        draw(_scheme)
        + "://"
        + draw(_host)
        + draw(_path)
        + ("?" + "&".join(q) if q else "")
        + draw(_frag)
    )


_TRACK = re.compile(urls.TRACKING_PARAM_RE)


def _py_normalize(u: str) -> str:
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^([^:/?#]+://[^/?#]*)", u)
    if m:
        u = m.group(1).lower() + u[m.end() :]
    body, _, frag = u.partition("#")
    base, qmark, query = body.partition("?")
    if qmark:
        kept = [p for p in query.split("&") if not _TRACK.search(p)]
        body = base + ("?" + "&".join(kept) if kept and query else "")
        if not kept:
            body = base
    return body + (("#" + frag) if frag else "")


@settings(max_examples=8, deadline=None)
@given(st.lists(_urls(), min_size=1, max_size=40))
def test_normalize_url_matches_python_and_is_idempotent(spark, raw):
    df = spark.createDataFrame([(u,) for u in set(raw)], "url string")
    got = {
        r["url"]: r["v"]
        for r in df.select(
            "url", urls.normalize_url(F.col("url")).alias("v")
        ).collect()
    }
    for u, v in got.items():
        assert v == _py_normalize(u), (u, v)
    # idempotency: normalizing the outputs is a no-op
    df2 = spark.createDataFrame([(v,) for v in set(got.values())], "url string")
    again = {
        r["url"]: r["v"]
        for r in df2.select(
            "url", urls.normalize_url(F.col("url")).alias("v")
        ).collect()
    }
    assert all(k == v for k, v in again.items()), again


_words = st.lists(
    st.from_regex(r"[a-z]{1,5}", fullmatch=True), min_size=0, max_size=30
).map(" ".join)


def _py_shingles(text, n):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_words, min_size=1, max_size=12),
    st.lists(_words, min_size=1, max_size=4),
    st.integers(min_value=1, max_value=4),
)
def test_contamination_hits_match_python(spark, train, ev, n):
    tdf = spark.createDataFrame(list(enumerate(train)), "doc_id long, text string")
    edf = spark.createDataFrame(list(enumerate(ev)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_hits"]
        for r in dc.contamination_hits(
            tdf, dc.eval_ngram_hashes(edf, n=n), n=n
        ).collect()
    }
    evs = set().union(*(_py_shingles(t, n) for t in ev)) if ev else set()
    want = {
        i: len(_py_shingles(t, n) & evs)
        for i, t in enumerate(train)
        if _py_shingles(t, n) & evs
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(_words, min_size=1, max_size=15), st.integers(2, 4))
def test_dup_ngram_ratio_matches_python(spark, texts, n):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id", ta.dup_ngram_ratio(F.col("text"), n).alias("v")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        want = 0.0 if not grams else 1.0 - len(set(grams)) / len(grams)
        assert abs(got[i] - want) < 1e-12, (t, got[i], want)


# ---------------------------------------------------------------------------
# substring-span dedup vs a pure-Python reference
# ---------------------------------------------------------------------------

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]
_docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=18).map(" ".join),
    min_size=2,
    max_size=7,
)


def _ref_span_dedup(texts, k):
    """Independent reference: brute-force window content matching, global
    first-occurrence keep, interval merge, position-filter rewrite."""
    toks = {i: t.split() for i, t in enumerate(texts)}
    wins = [
        (d, i, tuple(ts[i : i + k]))
        for d, ts in toks.items()
        for i in range(len(ts) - k + 1)
    ]
    from collections import Counter

    cnt = Counter(w for _, _, w in wins)
    first = {}
    for d, i, w in sorted(wins):
        first.setdefault(w, (d, i))
    covered = {d: set() for d in toks}
    for d, i, w in wins:
        if cnt[w] > 1 and first[w] != (d, i):
            covered[d].update(range(i, i + k))
    spans = {}
    for d, cov in covered.items():
        out, run = [], []
        for p in sorted(cov):
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.append((run[0], run[-1]))
                run = [p]
        if run:
            out.append((run[0], run[-1]))
        spans[d] = out
    cleaned = {
        d: (
            " ".join(
                t for p, t in enumerate(ts) if p not in covered[d]
            ),
            len(covered[d]),
        )
        for d, ts in toks.items()
    }
    return spans, cleaned


@given(_docs_strategy, st.integers(min_value=2, max_value=4))
@settings(max_examples=12, deadline=None)
def test_span_dedup_matches_python_reference(spark, texts, k):
    from search_engine_trec_fair_ranking_19_spark.operators import dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    ref_spans, ref_clean = _ref_span_dedup(texts, k)
    got_spans = {}
    for r in dedup.duplicate_spans(df, k=k).collect():
        got_spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert {d: sorted(v) for d, v in got_spans.items()} == {
        d: v for d, v in ref_spans.items() if v
    }
    got_clean = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in dedup.remove_duplicate_spans(df, k=k).collect()
    }
    assert got_clean == ref_clean

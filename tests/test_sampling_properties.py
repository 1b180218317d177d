"""Property tests for the deterministic-sampling/chunking family.

The family's contract is ENGINE-INDEPENDENCE: membership and window
geometry are pure functions of the data, re-derivable outside Spark.
These properties pin that against adversarial inputs (unicode keys,
degenerate token counts, extreme overlap) rather than the handful of
fixtures the example tests use. One Spark job per hypothesis example,
small example budgets — the suite stays fast.
"""

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.functions import chunking, sampling

# printable-ish unicode keys incl. multibyte; no surrogates
_keys = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=32),
    min_size=0,
    max_size=40,
)


def _py_bucket(key: str, n_buckets: int = sampling.DEFAULT_BUCKETS) -> int:
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


@settings(max_examples=8, deadline=None)
@given(st.lists(_keys, min_size=1, max_size=50, unique=True))
def test_hash_bucket_matches_hashlib_on_unicode_keys(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", sampling.hash_bucket(F.col("k")).alias("b")).collect()
    }
    assert got == {k: _py_bucket(k) for k in keys}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=25),
    st.data(),
)
def test_chunking_matches_reference_on_random_geometry(spark, lens, max_len, data):
    overlap = data.draw(st.integers(min_value=0, max_value=max_len - 1))
    stride = max_len - overlap
    docs = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lens)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk"].split()
        for r in chunking.chunk_tokens(df, max_len, overlap).collect()
    }
    want = {}
    for i, n in enumerate(lens):
        toks = [f"w{j}" for j in range(n)]
        if n == 0:
            continue
        nc = max(math.ceil((n - max_len) / stride), 0) + 1
        for c in range(nc):
            want[(i, c)] = toks[c * stride : c * stride + max_len]
    assert got == want
    # invariants: full coverage in order, exact overlap between neighbours
    for i, n in enumerate(lens):
        chs = [got[(i, c)] for c in range(sum(1 for k in got if k[0] == i))]
        if not chs:
            assert n == 0
            continue
        merged = list(chs[0])
        for prev, cur in zip(chs, chs[1:]):
            assert prev[stride:] == cur[: len(prev) - stride]
            merged += cur[len(prev) - stride :]
        assert merged == [f"w{j}" for j in range(n)]

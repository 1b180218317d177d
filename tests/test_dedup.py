"""Dedup-operator tests: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

import numpy as np
import pandas as pd
import pytest

from search_engine_trec_fair_ranking_19_spark.operators import dedup


def _docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (4, "completely different text about spark dataframes and shuffles"),
        (5, "THE  Quick Brown   Fox jumps over the lazy dog again and again"),  # normalized dup of 1
        (6, "another unrelated document mentioning minhash signatures only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    got = dedup.exact_duplicates(_docs_df(spark)).collect()
    groups = {}
    for r in got:
        groups.setdefault(r["canonical_id"], set()).add(r["doc_id"])
    assert groups == {1: {1, 2, 5}}
    assert all(r["group_size"] == 3 for r in got)


def test_exact_duplicates_plan_no_hot_key_window(spark):
    # skew guard: per-fp stats must come from groupBy+join (partial agg
    # collapses a mega-duplicated fingerprint map-side), never from a
    # Window.partitionBy(fp) that serializes the hot key into one task
    plan = (
        dedup.exact_duplicates(_docs_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_duplicate_spans_plan_windows_only_by_doc(spark):
    # per-whash occurrence stats must be groupBy+join for the same skew
    # reason; the only windows left are the per-doc island merge
    plan = (
        dedup.duplicate_spans(_docs_df(spark), k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(doc_id" in line, line
    assert "windowspecdefinition(whash" not in plan


def test_ngram_jaccard_exact(spark):
    pairs = dedup.ngram_jaccard_pairs(
        _docs_df(spark), n=3, threshold=0.5
    ).collect()
    got = {(r["a"], r["b"]): r["jaccard"] for r in pairs}
    # doc1/doc2 identical -> jaccard 1.0; doc1/doc3 differ in one word
    assert got[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got

    # independent python verification of jaccard(1,3)
    def sh(text, n=3):
        import re
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    rows = {r[0]: r[1] for r in _docs_df(spark).collect()}
    s1, s3 = sh(rows[1]), sh(rows[3])
    assert got[(1, 3)] == pytest.approx(len(s1 & s3) / len(s1 | s3))


def test_minhash_lsh_finds_near_dups(spark):
    pairs = dedup.minhash_dedup_pairs(
        _docs_df(spark), num_hashes=64, num_bands=16, threshold=0.5
    ).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (1, 2) in got  # identical docs always collide
    assert (1, 3) in got  # near dup found at 0.5 threshold
    assert all(p[0] < p[1] for p in got)
    # verified jaccard values must equal the exact operator's
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(_docs_df(spark), threshold=0.5).collect()
    }
    for r in pairs:
        assert r["jaccard"] == pytest.approx(exact[(r["a"], r["b"])])


def test_minhash_signature_determinism(spark):
    df = _docs_df(spark)
    s1 = {r["doc_id"]: tuple(r["sig"]) for r in dedup.minhash_signatures(df, num_hashes=32).collect()}
    s2 = {r["doc_id"]: tuple(r["sig"]) for r in dedup.minhash_signatures(df, num_hashes=32).collect()}
    assert s1 == s2
    assert s1[1] == s1[2]  # identical text -> identical signature
    # signature similarity approximates jaccard: doc1 vs doc3 share most mins
    agree = sum(a == b for a, b in zip(s1[1], s1[3]))
    assert agree >= 16  # true jaccard ~0.67 of 32 hashes


def test_simhash_near_dups(spark):
    pairs = dedup.simhash_near_dup_pairs(_docs_df(spark), max_hamming=10).collect()
    got = {(r["a"], r["b"]): r["hamming"] for r in pairs}
    assert got[(1, 2)] == 0  # identical docs -> identical simhash
    assert (1, 3) in got  # one-word change -> small hamming distance
    assert (1, 4) not in got and (1, 6) not in got


# ---------------------------------------------------------------------------
# duplicate-cluster resolution
# ---------------------------------------------------------------------------

def test_connected_components_chain_and_isolates(spark):
    # chain 10-20-30-40 (one component, min=10), pair {70,60}, isolate 99
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (70, 60)], "a long, b long"
    )
    nodes = spark.createDataFrame([(n,) for n in (10, 20, 30, 40, 60, 70, 99)], "id long")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs, nodes=nodes).collect()
    }
    assert got == {10: 10, 20: 10, 30: 10, 40: 10, 60: 60, 70: 60, 99: 99}


def test_connected_components_long_path_converges_logarithmically(spark):
    # a 64-node path is the adversarial diameter case; pointer jumping must
    # close it well under the 50-iteration cap (naive propagation needs 63).
    # driver_budget_edges=0 forces the DISTRIBUTED fixpoint
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    got = dedup.connected_components(
        pairs, max_iters=14, driver_budget_edges=0
    ).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == n


def test_connected_components_driver_matches_distributed(spark):
    # the sub-budget driver union-find and the distributed fixpoint are the
    # SAME contract: identical (node, component) on a multi-cluster graph
    # with isolates, and the budget boundary routes correctly
    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (40, 41), (41, 42), (42, 40)],
        "a long, b long",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in (3, 5, 9, 20, 21, 40, 41, 42, 99)], "id long"
    )
    fast = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs, nodes=nodes).collect()
    }
    slow = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            pairs, nodes=nodes, driver_budget_edges=0
        ).collect()
    }
    assert fast == slow == {
        3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 40: 40, 41: 40, 42: 40, 99: 99
    }
    # budget of exactly |edges| takes the driver path; |edges|-1 must not
    over = dedup.connected_components(pairs, driver_budget_edges=6).collect()
    under = dedup.connected_components(pairs, driver_budget_edges=5).collect()
    assert {(r["node"], r["component"]) for r in over} == {
        (r["node"], r["component"]) for r in under
    }


def test_dedup_clusters_and_drop(spark):
    docs = _docs_df(spark)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    clusters = {r["doc_id"]: r for r in dedup.dedup_clusters(docs, pairs).collect()}
    # docs 1,2,3,5 form one near-dup cluster (canonical 1); 4 and 6 are singletons
    assert clusters[1]["component"] == 1 and clusters[1]["is_canonical"]
    for d in (2, 3, 5):
        assert clusters[d]["component"] == 1 and not clusters[d]["is_canonical"]
        assert clusters[d]["cluster_size"] == 4
    for d in (4, 6):
        assert clusters[d]["component"] == d and clusters[d]["is_canonical"]
        assert clusters[d]["cluster_size"] == 1

    kept = sorted(
        r["doc_id"] for r in dedup.drop_near_duplicates(docs, pairs).collect()
    )
    assert kept == [1, 4, 6]


def test_short_docs_yield_empty_shingles(spark):
    # docs with fewer than n tokens must produce ZERO shingles (not an
    # error: sequence(0, size-n) with size<n is a descending [0,-1,...]
    # and slice/element_at at 0 throws) — and never pair with anything
    from pyspark.sql import functions as F

    short = spark.createDataFrame(
        [(1, "one two"), (2, "single"), (3, ""), (4, "one two three four")],
        "doc_id long, text string",
    )
    sh = short.select(
        "doc_id", F.size(dedup.shingles(F.col("text"), 3)).alias("n")
    ).collect()
    assert {r["doc_id"]: r["n"] for r in sh} == {1: 0, 2: 0, 3: 0, 4: 2}
    assert dedup.ngram_jaccard_pairs(short, n=3, threshold=0.0).count() == 0
    # hashed (MinHash) shingle path: same emptiness, no error
    hs = dedup._hashed_shingles(short, "doc_id", "text", 3).collect()
    assert {r["doc_id"]: len(r["hs"]) for r in hs} == {1: 0, 2: 0, 3: 0, 4: 2}
    assert (
        dedup.minhash_dedup_pairs(
            short, num_hashes=16, num_bands=8, threshold=0.1
        ).count()
        == 0
    )


def test_minhash_index_matches_component_functions(spark):
    # the one-pass (doc_id, hs, sig) artifact equals hs+sig computed apart
    idx = {
        r["doc_id"]: r
        for r in dedup.minhash_index(_docs_df(spark), num_hashes=32).collect()
    }
    hs = {
        r["doc_id"]: r["hs"]
        for r in dedup._hashed_shingles(_docs_df(spark), "doc_id", "text", 3)
        .collect()
    }
    sig = {
        r["doc_id"]: r["sig"]
        for r in dedup.minhash_signatures(_docs_df(spark), num_hashes=32)
        .collect()
    }
    assert set(idx) == set(hs) == set(sig) == {1, 2, 3, 4, 5, 6}
    for d in idx:
        assert sorted(idx[d]["hs"]) == sorted(hs[d])
        assert idx[d]["sig"] == sig[d]


def test_minhash_pairs_between_incremental(spark):
    # corpus = docs 1..4; new batch = 7 (near-dup of 1), 8 (unique),
    # 1 (re-crawl of itself — must pair at jaccard 1.0)
    corpus = dedup.minhash_index(_docs_df(spark), num_hashes=64)
    new = spark.createDataFrame(
        [
            (7, "the quick brown fox jumps over the lazy dog again and again today"),
            (8, "entirely novel content with no overlap whatsoever in any shingle"),
            (1, "the quick brown fox jumps over the lazy dog again and again"),
        ],
        "doc_id long, text string",
    )
    new_idx = dedup.minhash_index(new, num_hashes=64)
    pairs = dedup.minhash_pairs_between(
        new_idx, corpus, num_bands=32, threshold=0.5
    ).collect()
    got = {(r["new_id"], r["corpus_id"]): r["jaccard"] for r in pairs}
    # 1 is a re-crawl: exact match with corpus docs 1, 2 and normalized 5
    assert got[(1, 1)] == 1.0 and got[(1, 2)] == 1.0 and got[(1, 5)] == 1.0
    # 7 near-dups the 1/2/5 cluster (one appended word)
    assert all((7, c) in got for c in (1, 2, 5))
    assert all(0.5 <= got[(7, c)] < 1.0 for c in (1, 2, 5))
    # 8 pairs with nothing
    assert not any(nid == 8 for nid, _ in got)
    # parity with the exact between-set: no pair the brute-force union-join
    # finds at >= 0.5 is missing (recall 1 in this regime), none extra
    both = _docs_df(spark).unionByName(new.filter("doc_id >= 7"))
    exact = dedup.ngram_jaccard_pairs(both, n=3, threshold=0.5).collect()
    exact_between = {
        (max(r["a"], r["b"]), min(r["a"], r["b"])): round(r["jaccard"], 9)
        for r in exact
        if (r["a"] >= 7) != (r["b"] >= 7)
    }
    got_between = {
        (n, c): round(j, 9) for (n, c), j in got.items() if n >= 7
    }
    assert got_between == exact_between


def test_drop_near_duplicates_against(spark):
    corpus = dedup.minhash_index(_docs_df(spark), num_hashes=64)
    new = spark.createDataFrame(
        [
            (7, "the quick brown fox jumps over the lazy dog again and again today"),
            (8, "entirely novel content with no overlap whatsoever in any shingle"),
        ],
        "doc_id long, text string",
    )
    kept = dedup.drop_near_duplicates_against(
        new, corpus, num_hashes=64, num_bands=32, threshold=0.5
    ).collect()
    assert [r["doc_id"] for r in kept] == [8]
    assert len(kept[0].asDict()) == 2  # original columns preserved


# ---------------------------------------------------------------------------
# substring-span dedup (duplicated k-token windows)
# ---------------------------------------------------------------------------

def _span_docs(spark):
    rows = [
        (1, "a b c d e f g h i j k l"),   # first occurrence of everything
        (2, "x y c d e f z w q r s t"),   # one 4-window dup ('c d e f')
        (3, "p q r"),                     # shorter than k -> no windows
        (4, "a b c d e f g h i j k l"),   # exact dup of 1 -> fully covered
        (5, "m n o a b c d e f g h i j k l u v"),  # dup run mid-doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_spans(rows, k):
    """Tiny python reference: same semantics, brute force on content."""
    toks = {d: t.split() for d, t in rows}
    wins = [
        (d, i, " ".join(ts[i : i + k]))
        for d, ts in toks.items()
        for i in range(len(ts) - k + 1)
    ]
    from collections import Counter, defaultdict

    cnt = Counter(w for _, _, w in wins)
    first = {}
    for d, i, w in sorted(wins, key=lambda x: (x[0], x[1])):
        first.setdefault(w, (d, i))
    removed = defaultdict(list)
    for d, i, w in wins:
        if cnt[w] > 1 and first[w] != (d, i):
            removed[d].append(i)
    spans = []
    for d, starts in removed.items():
        starts.sort()
        cur = [starts[0], starts[0]]
        out = []
        for s in starts[1:]:
            if s <= cur[1] + k:
                cur[1] = s
            else:
                out.append(cur)
                cur = [s, s]
        out.append(cur)
        for s0, s1 in out:
            n_win = sum(1 for s in starts if s0 <= s <= s1)
            spans.append((d, s0, s1 + k - 1, n_win))
    return sorted(spans)


def test_duplicate_spans_matches_reference(spark):
    rows = [
        (1, "a b c d e f g h i j k l"),
        (2, "x y c d e f z w q r s t"),
        (3, "p q r"),
        (4, "a b c d e f g h i j k l"),
        (5, "m n o a b c d e f g h i j k l u v"),
    ]
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in dedup.duplicate_spans(_span_docs(spark), k=4).collect()
    )
    assert got == _py_spans(rows, 4)
    # the exact-dup doc is covered end to end; the first occurrence is not
    by_doc = {g[0]: g for g in got}
    assert 1 not in by_doc
    assert by_doc[4][1:3] == (0, 11)


def test_duplicate_spans_within_doc_repeat(spark):
    # the SAME window twice in ONE doc: second instance is removed
    df = spark.createDataFrame(
        [(7, "a b c d Z a b c d")], "doc_id long, text string"
    )
    got = [
        (r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(df, k=4).collect()
    ]
    assert got == [(5, 8)]


def test_remove_duplicate_spans(spark):
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in dedup.remove_duplicate_spans(
            _span_docs(spark), k=4
        ).collect()
    }
    assert len(out) == 5  # one row per INPUT doc, span-free docs included
    assert out[1] == ("a b c d e f g h i j k l", 0)
    assert out[2] == ("x y z w q r s t", 4)
    assert out[3] == ("p q r", 0)
    assert out[4] == ("", 12)  # exact dup fully deleted
    # doc5: 'a b c ... l' (12 tokens) covered, 'm n o' + 'u v' survive
    assert out[5] == ("m n o u v", 12)


def test_remove_duplicate_spans_carries_columns(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f", "en"), (2, "a b c d e f", "de")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: (r["text"], r["lang"])
        for r in dedup.remove_duplicate_spans(df, k=4).collect()
    }
    assert out[1] == ("a b c d e f", "en")
    assert out[2] == ("", "de")


def test_minhash_and_simhash_accept_string_ids(spark):
    # webtext corpora key on url STRINGS — the Arrow kernels must follow
    # the input id type instead of hardcoding long (regression: the first
    # string-id batch died with an ArrowColumnVector accessor error)
    rows = [
        ("https://a.example/x", "the quick brown fox jumps over the lazy dog"),
        ("https://b.example/y", "the quick brown fox jumps over the lazy dog"),
        ("https://c.example/z", "completely different text about spark joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = dedup.minhash_dedup_pairs(
        df, num_hashes=32, num_bands=16, threshold=0.5
    ).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {
        ("https://a.example/x", "https://b.example/y")
    }
    sim = dedup.simhash_near_dup_pairs(df, max_hamming=3).collect()
    assert {(r["a"], r["b"]) for r in sim} == {
        ("https://a.example/x", "https://b.example/y")
    }

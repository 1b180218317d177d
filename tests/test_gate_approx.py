"""Verification for the approximate operators in their PRODUCTION regimes
(sub-threshold candidates, lower-recall parameterizations, the xxhash64
token hash). The driver gates cover the provably/verifiably-exact regimes
with full SQL oracles since round 4 (see the q_* docstrings in
entry_queries.py); these tests carry the rest of the correctness story at
the gate's own data (/root/testdata/sf0.001):

  * soundness — every emitted pair/row is exactly verifiable (true Jaccard,
    true hamming, true cosine);
  * subset — LSH candidates are a subset of the exact operator's output;
  * recall — high-similarity pairs are provably/empirically recovered.
"""

import os

import numpy as np
import pytest

from search_engine_trec_fair_ranking_19_spark.operators import dedup, similarity

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def test_minhash_pairs_subset_of_exact_with_equal_jaccard(spark):
    docs = _docs(spark).filter("doc_id < 150")
    lsh = dedup.minhash_dedup_pairs(
        docs, n=2, num_hashes=64, num_bands=32, threshold=0.05
    ).collect()
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.05).collect()
    }
    assert lsh, "gate parameters should surface candidate pairs"
    for r in lsh:
        key = (r["a"], r["b"])
        # subset: every LSH pair is a true >=threshold pair...
        assert key in exact
        # ...soundness: with the exact operator's exact Jaccard
        assert r["jaccard"] == pytest.approx(exact[key], abs=1e-9)


def test_minhash_recall_on_high_similarity_pairs(spark):
    # recall floor where LSH is supposed to shine: with 32 bands of 2 rows,
    # P(miss | jaccard s) = (1 - s^2)^32 -> < 1e-4 at s >= 0.5
    docs = _docs(spark).filter("doc_id < 150")
    exact_high = {
        (r["a"], r["b"])
        for r in dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()
    }
    got = {
        (r["a"], r["b"])
        for r in dedup.minhash_dedup_pairs(
            docs, n=2, num_hashes=64, num_bands=32, threshold=0.5
        ).collect()
    }
    missed = exact_high - got
    assert not missed, f"high-similarity pairs missed by LSH: {missed}"


def test_simhash_pairs_sound_and_complete_at_pigeonhole_bound(spark):
    docs = _docs(spark)
    sigs = {
        r["doc_id"]: np.uint64(np.int64(r["simhash"]))
        for r in dedup.simhash_signatures(docs).collect()
    }
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=16).collect()
    }
    # soundness: reported hamming equals popcount(xor) of the signatures
    for (a, b), h in got.items():
        true_h = int(bin(int(sigs[a] ^ sigs[b])).count("1"))
        assert h == true_h and h <= 16

    # completeness at the pigeonhole bound: 4 bands x 16 bits guarantee any
    # pair with hamming <= 3 shares a band — brute-force all pairs to check
    ids = sorted(sigs)
    arr = np.array([int(sigs[i]) for i in ids], dtype=np.uint64)
    close3 = set()
    for i in range(len(ids)):
        x = arr[i] ^ arr[i + 1 :]
        h = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(h <= 3)[0]:
            close3.add((ids[i], ids[i + 1 + int(j)]))
    got3 = {
        (r["a"], r["b"])
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert close3 == got3


def test_ann_lsh_sound_and_recall_vs_brute_force(spark):
    emb = _emb(spark)
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    qvec = rows[0]
    ids = sorted(rows)
    mat = np.stack([rows[i] for i in ids])
    cos = (mat @ qvec) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qvec))
    order = np.lexsort((ids, -cos))
    exact_top10 = {ids[i] for i in order[:10]}
    cos_by_id = {ids[i]: cos[i] for i in range(len(ids))}

    got = similarity.lsh_topk(
        emb, qvec.tolist(), k=10, n_planes=10, n_tables=8, n_probes=10
    ).collect()
    # soundness: re-ranked cosines are the TRUE cosines
    for r in got:
        assert r["cosine"] == pytest.approx(cos_by_id[r["vec_id"]], abs=1e-6)
    # recall floor vs the (hash-green) brute-force oracle, at the gate's own
    # parameters (hamming-2 multiprobe measured 0.9 on this data)
    recall = len({r["vec_id"] for r in got} & exact_top10) / 10
    assert recall >= 0.7
    # the query vector itself (vec_id 0, cosine 1.0) must always be found
    assert 0 in {r["vec_id"] for r in got}


def test_embedding_neardup_lsh_subset_of_exact_with_equal_cosine(spark):
    # the gate's own data and parameters (entry_queries.q_embedding_neardup_lsh)
    emb = _emb(spark)
    lsh = similarity.embedding_near_dup_pairs(
        emb, threshold=0.3, n_planes=4, n_tables=8
    ).collect()
    exact = {
        (r["a"], r["b"]): r["cosine"]
        for r in similarity.embedding_near_dup_pairs_exact(
            emb, threshold=0.3
        ).collect()
    }
    assert lsh, "gate parameters should surface candidate pairs"
    for r in lsh:
        key = (r["a"], r["b"])
        # subset: every LSH pair is a true >=threshold pair...
        assert key in exact
        # ...soundness: with the exact operator's exact cosine
        assert r["cosine"] == pytest.approx(exact[key], abs=1e-9)


def test_embedding_neardup_lsh_recall_on_planted_duplicates(spark):
    # near-dup regime the operator exists for: planted pairs at cosine ~0.95+
    # (per-plane collision prob 1 - theta/pi ~ 0.9; miss prob per table
    # 1 - 0.9^4 ~ 0.33, over 8 tables ~ 0.33^8 < 2e-4)
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 32)).astype("float32")
    noisy = base + 0.1 * rng.standard_normal((40, 32)).astype("float32")
    rows = [
        (i, [float(x) for x in v])
        for i, v in enumerate(np.concatenate([base, noisy]))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["a"], r["b"])
        for r in similarity.embedding_near_dup_pairs_exact(
            emb, threshold=0.9
        ).collect()
    }
    got = {
        (r["a"], r["b"])
        for r in similarity.embedding_near_dup_pairs(
            emb, threshold=0.9, n_planes=4, n_tables=8
        ).collect()
    }
    assert exact, "planted duplicates must exist at cosine >= 0.9"
    assert got <= exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95

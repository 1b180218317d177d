"""ANN similarity-search tests: brute-force exactness + LSH recall."""

import numpy as np
import pytest

from search_engine_trec_fair_ranking_19_spark.operators import similarity


def _emb_df(spark, n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs,
    )


def _numpy_topk(vecs, q, k):
    q = np.asarray(q, dtype=np.float64)
    v = vecs.astype(np.float64)
    cos = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(v)), -cos))
    return [(int(i), float(cos[i])) for i in order[:k]]


def test_brute_force_matches_numpy(spark):
    df, vecs = _emb_df(spark)
    q = vecs[0].tolist()
    got = [(r["vec_id"], r["cosine"]) for r in similarity.brute_force_topk(df, q, k=10).collect()]
    exp = _numpy_topk(vecs, q, 10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (gi, gc), (ei, ec) in zip(got, exp):
        assert gc == pytest.approx(ec, abs=1e-6)
    assert got[0][0] == 0 and got[0][1] == pytest.approx(1.0, abs=1e-6)


def test_lsh_recall(spark):
    df, vecs = _emb_df(spark, n=300)
    q = (vecs[7] + np.random.default_rng(1).standard_normal(16) * 0.01).tolist()
    exact = {i for i, _ in _numpy_topk(vecs, q, 10)}
    got = {
        r["vec_id"]
        for r in similarity.lsh_topk(df, q, k=10, n_planes=8, n_tables=8).collect()
    }
    # multi-table LSH should recover most of the true top-10 (incl. vec 7)
    assert 7 in got
    assert len(exact & got) >= 5


def test_lsh_candidates_subset_rerank_exact(spark):
    # every pair LSH returns must carry the TRUE cosine (re-rank is exact)
    df, vecs = _emb_df(spark, n=100)
    q = vecs[3].tolist()
    rows = similarity.lsh_topk(df, q, k=5, n_planes=6, n_tables=4).collect()
    for r in rows:
        true_cos = _numpy_topk(vecs, q, 100)
        lookup = dict(true_cos)
        assert r["cosine"] == pytest.approx(lookup[r["vec_id"]], abs=1e-6)


def test_ivf_recall_and_exactness_at_full_probe(spark):
    df, vecs = _emb_df(spark, n=300)
    centroids, assignments = similarity.ivf_index(df, n_centroids=8, seed=7)
    assert centroids.shape == (8, 16)
    assert assignments.count() == 300
    q = (vecs[7] + np.random.default_rng(1).standard_normal(16) * 0.01).tolist()
    exact = {i for i, _ in _numpy_topk(vecs, q, 10)}
    # probing HALF the lists must recover the bulk of the true top-10
    got = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            df, centroids, assignments, q, k=10, nprobe=4
        ).collect()
    }
    assert 7 in got
    assert len(exact & got) >= 5
    # nprobe = n_centroids degenerates to the exact scan
    full = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_topk(
            df, centroids, assignments, q, k=10, nprobe=8
        ).collect()
    ]
    for (gi, gc), (ei, ec) in zip(full, _numpy_topk(vecs, q, 10)):
        assert gi == ei
        assert gc == pytest.approx(ec, abs=1e-6)


def test_ivf_partitioned_write_prunes_and_matches(spark, tmp_path):
    """The materialized inverted file (ivf_write: partitionBy cluster) must
    (a) plan the probe as a PARTITION filter — only the probed lists' files
    are read — and (b) return exactly what ivf_topk returns on the same
    centroids/assignments."""
    df, vecs = _emb_df(spark, n=300)
    centroids, assignments = similarity.ivf_index(df, n_centroids=8, seed=7)
    path = str(tmp_path / "ivf_table")
    similarity.ivf_write(df, centroids, assignments, path)

    q = (vecs[7] + np.random.default_rng(1).standard_normal(16) * 0.01).tolist()
    got = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_topk_from_path(
            spark, path, q, k=10, nprobe=4
        ).collect()
    ]
    want = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_topk(
            df, centroids, assignments, q, k=10, nprobe=4
        ).collect()
    ]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, gc), (_, wc) in zip(got, want):
        assert gc == pytest.approx(wc, abs=1e-9)

    # pruning proof: the probed scan touches fewer files than the table,
    # and the physical plan carries the cluster predicate as a
    # PartitionFilter (planning-time pruning, not a post-scan filter)
    from pyspark.sql import functions as F

    full = spark.read.parquet(path)
    n_clusters = full.select("cluster").distinct().count()
    assert n_clusters > 4  # the probe genuinely excludes lists
    probed = full.filter(F.col("cluster").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), plan  # planning-time pruning
    # runtime proof: only the two probed lists' files produce rows
    n_files_read = probed.select(F.input_file_name()).distinct().count()
    n_files_all = full.select(F.input_file_name()).distinct().count()
    assert n_files_read < n_files_all

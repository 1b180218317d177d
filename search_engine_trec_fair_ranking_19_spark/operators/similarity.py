"""Similarity search over embedding columns (`array<float>`).

Two paths:
  * brute-force cosine top-k — the exact baseline: JVM-side dot product via
    `F.zip_with`/`F.aggregate` (no Python in the scan), TakeOrderedAndProject
    for the bounded-heap top-k.
  * random-hyperplane LSH   — the scale path: signed-projection bucket keys
    from a vectorized pandas UDF, candidate generation by bucket join (with
    multi-probe via several independent tables), exact cosine re-rank of
    candidates only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import local_rows_df


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_similarity(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of one query vector against the table.

    The plan is scan → codegen'd expression → TakeOrderedAndProject: one pass,
    no shuffle, heap-bounded memory per partition at any scale."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    ecol = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        embeddings.select(
            F.col(id_col),
            cosine_similarity(ecol, qlit).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float32)


def lsh_bucket_signatures(
    embeddings: DataFrame,
    dim: int | None,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket) — one signed-projection bucket per hash table.

    Vectorized: each Arrow batch is one (batch × dim) @ (dim × planes) matmul.
    ``dim=None`` infers the dimension from the first vector seen on each
    worker — the hyperplanes are a pure function of (dim, seed), so every
    worker derives the identical family."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes: list[np.ndarray] | None = (
            None
            if dim is None
            else [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
        )
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].values).astype(np.float32)
            if planes is None:
                planes = [
                    _hyperplanes(mat.shape[1], n_planes, seed + t)
                    for t in range(n_tables)
                ]
            ids = pdf[id_col].values
            out_ids, out_tables, out_buckets = [], [], []
            powers = 1 << np.arange(n_planes, dtype=np.int64)
            for t, P in enumerate(planes):
                bits = (mat @ P) > 0
                buckets = (bits * powers).sum(axis=1)
                out_ids.append(ids)
                out_tables.append(np.full(len(ids), t))
                out_buckets.append(buckets)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_ids),
                    "table": np.concatenate(out_tables),
                    "bucket": np.concatenate(out_buckets),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema="vec_id long, table int, bucket long"
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 8,
) -> DataFrame:
    """Approximate cosine top-k: multi-probe the query's buckets in every
    table, union candidates, exact re-rank. Recall grows with n_tables and
    n_probes — per table the base bucket plus every bucket within hamming
    distance 2 over the ``n_probes`` weakest-margin hyperplane bits is probed
    (standard multiprobe LSH: a near neighbor that lands across one or two
    low-margin planes is recovered without paying for more tables; measured
    on the 64-dim gate embeddings this lifts recall@10 from 0.4 to ~0.9
    while probing <50%% of buckets)."""
    dim = len(query_vec)
    q = np.asarray(query_vec, dtype=np.float32)
    probe = []
    powers = 1 << np.arange(n_planes, dtype=np.int64)
    for t in range(n_tables):
        proj = q @ _hyperplanes(dim, n_planes, seed + t)
        bits = proj > 0
        base = int((bits * powers).sum())
        bucket_set = {base}
        weakest = np.argsort(np.abs(proj))[: min(n_probes, n_planes)]
        for a in range(len(weakest)):
            bucket_set.add(base ^ int(powers[int(weakest[a])]))
            for b in range(a + 1, len(weakest)):
                bucket_set.add(
                    base
                    ^ int(powers[int(weakest[a])])
                    ^ int(powers[int(weakest[b])])
                )
        probe.extend((t, bk) for bk in bucket_set)
    sigs = lsh_bucket_signatures(
        embeddings, dim, n_planes, n_tables, seed, id_col, vec_col
    )
    probe_df = local_rows_df(sigs.sparkSession, probe, "table int, bucket long")
    candidates = (
        sigs.join(F.broadcast(probe_df), ["table", "bucket"])
        .select("vec_id")
        .distinct()
    )
    cand_vecs = embeddings.join(
        candidates, embeddings[id_col] == candidates["vec_id"]
    ).select(embeddings[id_col], F.col(vec_col))
    return brute_force_topk(cand_vecs, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (a < b, cosine) with
    cosine >= threshold.

    This is the quadratic EXACT BASELINE (same role as
    :func:`dedup.ngram_jaccard_pairs` for text): the a<b self-join is a
    nested-loop product, correct and fine for gate-scale verification but not
    the 100 TB path — :func:`embedding_near_dup_pairs` is the scale path and
    is pytest-pinned as a subset of this operator's output with equal cosine
    values. Cosine is computed entirely JVM-side (zip_with/aggregate)."""
    ecol = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    left = embeddings.select(
        F.col(id_col).alias("a"), ecol.alias("_va")
    )
    right = embeddings.select(
        F.col(id_col).alias("b"), ecol.alias("_vb")
    )
    cos = cosine_similarity(F.col("_va"), F.col("_vb"))
    return (
        left.join(right, F.col("a") < F.col("b"))
        .select("a", "b", cos.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed — the 100 TB path.

    Candidate generation is a per-(table, bucket) self-join over the
    random-hyperplane signatures (signed-projection collision probability
    per plane is 1 - theta/pi, so a cosine-near pair collides in at least
    one of the ``n_tables`` tables w.h.p.), followed by an EXACT cosine
    verify of candidates only — every emitted pair therefore carries its
    true cosine and is a subset of
    :func:`embedding_near_dup_pairs_exact`'s output (pytest-pinned, with a
    recall floor on planted near-duplicates).

    Scale shape: one shuffle to build signatures, one bucket-keyed
    self-join whose fan-out is bounded by bucket occupancy (tune
    ``n_planes`` up to split hot buckets; AQE skew-join splits stragglers),
    one distinct, one join back to vectors for the verify. No quadratic
    stage touches the full table."""
    sigs = lsh_bucket_signatures(
        embeddings,
        dim=None,  # inferred per batch from the vectors themselves
        n_planes=n_planes,
        n_tables=n_tables,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )
    x = sigs.alias("x")
    y = sigs.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.table") == F.col("y.table"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b")
        )
        .distinct()
    )
    ecol = F.transform(F.col(vec_col), lambda x_: x_.cast("double"))
    va = embeddings.select(F.col(id_col).alias("a"), ecol.alias("_va"))
    vb = embeddings.select(F.col(id_col).alias("b"), ecol.alias("_vb"))
    cos = cosine_similarity(F.col("_va"), F.col("_vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", cos.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer + probed-list re-rank
# ---------------------------------------------------------------------------


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    seed: int = 7,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, DataFrame]:
    """Coarse quantizer for IVF ANN: k-means over the embedding column
    (Spark ML, one distributed fit) → (centroids array, (vec_id, cluster)
    assignments DataFrame).

    The assignments ARE the inverted file: at scale, write them as a table
    partitioned/bucketed by ``cluster`` so a probe reads only its lists'
    files (partition pruning does the "inverted" part); centroids are
    driver-sized (n_centroids × dim) by construction. Deterministic for a
    fixed (data, seed) — Spark ML k-means|| is seeded — but NOT a pure
    function of the row values alone, so gates pin recall, not hashes."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        F.col(id_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("__features"),
    )
    model = KMeans(
        k=n_centroids,
        seed=seed,
        maxIter=max_iter,
        featuresCol="__features",
        predictionCol="cluster",
    ).fit(feats)
    centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])
    assignments = model.transform(feats).select(id_col, "cluster")
    return centroids, assignments


def ivf_topk(
    embeddings: DataFrame,
    centroids: np.ndarray,
    assignments: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate cosine top-k: rank centroids against the query on the
    DRIVER (n_centroids is tiny), probe the ``nprobe`` nearest lists, exact
    cosine re-rank of those lists' vectors only.

    Complements :func:`lsh_topk`: IVF adapts to the data distribution (lists
    are k-means cells, so clustered corpora probe far fewer vectors than
    data-oblivious hyperplane buckets), at the cost of a training pass and a
    non-pure index. Recall grows with ``nprobe``; nprobe = n_centroids
    degenerates to the exact scan."""
    q = np.asarray(query_vec, dtype=np.float64)
    sims = (centroids @ q) / (
        np.linalg.norm(centroids, axis=1) * np.linalg.norm(q) + 1e-12
    )
    probe = [int(c) for c in np.argsort(-sims)[: max(1, nprobe)]]
    cand = assignments.filter(F.col("cluster").isin(probe)).select(id_col)
    cand_vecs = embeddings.join(cand, id_col).select(
        F.col(id_col), F.col(vec_col)
    )
    return brute_force_topk(cand_vecs, query_vec, k, id_col, vec_col)


def ivf_write(
    embeddings: DataFrame,
    centroids: np.ndarray,
    assignments: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the inverted file the `ivf_index` docstring promises:
    vectors joined to their list assignment, written ``partitionBy("cluster")``
    — each k-means list is its own partition directory, so a probed query's
    ``cluster IN (...)`` filter prunes to ``nprobe`` directories at PLANNING
    time (Catalyst partition pruning; the non-probed lists' files are never
    opened). Centroids are driver-sized and ride along as a Spark-invisible
    ``_ivf_centroids.json`` sidecar inside the table directory.

    At 100 TB this is the layout that makes IVF an index rather than a scan:
    probe cost is O(nprobe/n_centroids) of the data by file pruning alone,
    before any row is read."""
    import json
    import os

    (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .join(assignments.select(id_col, "cluster"), id_col)
        .write.partitionBy("cluster")
        .mode("overwrite")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump(np.asarray(centroids, dtype=float).tolist(), f)


def ivf_load_centroids(path: str) -> np.ndarray:
    import json
    import os

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        return np.asarray(json.load(f), dtype=np.float64)


def ivf_topk_from_path(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`ivf_topk` over a materialized inverted file (:func:`ivf_write`):
    rank centroids on the driver, scan ONLY the probed lists' partition
    directories (the ``cluster IN (...)`` predicate is a partition filter —
    assert via ``df.inputFiles()``/the plan's PartitionFilters), exact cosine
    re-rank of those lists."""
    centroids = ivf_load_centroids(path)
    q = np.asarray(query_vec, dtype=np.float64)
    sims = (centroids @ q) / (
        np.linalg.norm(centroids, axis=1) * np.linalg.norm(q) + 1e-12
    )
    probe = [int(c) for c in np.argsort(-sims)[: max(1, nprobe)]]
    lists = spark.read.parquet(path).filter(F.col("cluster").isin(probe))
    return brute_force_topk(
        lists.select(F.col(id_col), F.col(vec_col)), query_vec, k,
        id_col, vec_col,
    )

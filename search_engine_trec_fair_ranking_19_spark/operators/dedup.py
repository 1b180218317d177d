"""Deduplication operators for web-scale training-data pipelines.

Five families, each Spark-first:
  * exact          — fingerprint groupBy (one shuffle on a 16-byte key)
  * n-gram Jaccard — shingle explode + shared-shingle self-join (exact measure)
  * MinHash + LSH  — vectorized numpy signatures → band buckets → bucket join
                     → exact-Jaccard verify (the 100 TB near-dup scale path)
  * SimHash        — 64-bit weighted sign-hash + hamming-band join
  * embedding      — cosine over `array<float>` columns (see similarity.py)

Signatures are Arrow-batched pandas UDFs (numpy inside); candidate generation
and verification are plain joins/aggs, so AQE/skew handling applies. No
collect()-side loops anywhere.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_analysis import fingerprint

_MERSENNE = (1 << 61) - 1


def _spread(df: DataFrame) -> DataFrame:
    """Ensure heavy pandas-UDF stages get cluster-wide parallelism: a small
    parquet input (one file < maxPartitionBytes) arrives as ONE partition, so
    a mapInPandas signature pass would run on one core. At real scale inputs
    have thousands of partitions and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) docs: (fp, doc_id, canonical_id).

    canonical_id = min id in the group; only groups with >1 member returned.
    One shuffle on the md5 fingerprint."""
    w = Window.partitionBy("fp")
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("group_size") > 1)
        .select("fp", "doc_id", "canonical_id", "group_size")
    )


# ---------------------------------------------------------------------------
# word n-gram shingles + exact Jaccard
# ---------------------------------------------------------------------------

def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased word tokens."""
    toks = F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (a < b): shared-shingle self-join.

    |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|. Quadratic only within shingle
    groups — correct baseline; MinHash-LSH below is the scale path."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_shingles").alias("size_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_shingles").alias("size_b")), "b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("size_a") + F.col("size_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _stable_u64(values: pd.Series) -> np.ndarray:
    """Deterministic 64-bit hash of strings (blake2b-8; platform-independent)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(v.encode("utf-8"), digest_size=8).digest(), "little")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def _minhash_params(num_hashes: int, seed: int = 0x5EED):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    seed: int = 0x5EED,
) -> DataFrame:
    """(doc_id, sig array<long>) — MinHash over word n-gram shingles.

    mapInPandas: per batch, shingle in Python, base-hash with blake2b, then one
    (shingles × hashes) universal-hash min-reduce in numpy (vectorized; the
    permutation family is h_i(x) = (a_i·x + b_i) mod 2^61−1)."""
    a, b = _minhash_params(num_hashes, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                toks = [t for t in _word_split(text)] if text else []
                sh = {" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}
                if not sh:
                    sig = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)
                else:
                    base = _stable_u64(pd.Series(sorted(sh))) % _MERSENNE
                    # (H,) x (S,) -> (H,S) universal hashes, min over shingles
                    hashed = (a[:, None] * base[None, :] + b[:, None]) % _MERSENNE
                    sig = hashed.min(axis=1).astype(np.int64)
                ids.append(doc_id)
                sigs.append(sig)
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return _spread(df.select(F.col(id_col).alias(id_col), F.col(text_col))).mapInPandas(
        gen, schema="doc_id long, sig array<long>"
    )


def _word_split(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def lsh_candidate_pairs(
    signatures: DataFrame, num_bands: int = 16
) -> DataFrame:
    """Band the signatures and self-join on (band, band-hash) → candidate pairs.

    Rows per doc = num_bands (tiny); the join key is the hashed band slice, so
    head buckets are data-identical docs — exactly what we want colliding."""
    rows_per_band = None  # inferred from sig length at runtime via slice

    sig_len = F.size(F.col("sig"))
    r = (sig_len / num_bands).cast("int")
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda band: F.struct(
                    band.alias("band"),
                    F.hash(F.slice(F.col("sig"), band * r + 1, r)).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col("doc_id").alias("a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    num_bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline with exact-Jaccard verification.

    Candidates are materialized (they are tiny relative to the corpus — LSH's
    whole point), then the shingle table is cut to candidate docs with
    semi-joins BEFORE the shared-shingle join, so verification cost scales
    with the candidate set, not the corpus."""
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    candidates = lsh_candidate_pairs(sigs, num_bands).persist()
    candidates.count()  # materialize once; small

    cand_docs = (
        candidates.select(F.col("a").alias("doc_id"))
        .union(candidates.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sh = (
        df.join(cand_docs, df[id_col] == cand_docs["doc_id"], "left_semi")
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles(F.col(text_col), n)).alias("shingle"),
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    # candidates is persisted: AQE sees its true (small) size and broadcasts;
    # no explicit broadcast hint — at extreme scale the candidate set may
    # legitimately exceed broadcast limits and must shuffle
    inter = (
        a.join(candidates, "a")
        .join(b, ["shingle", "b"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_shingles").alias("size_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_shingles").alias("size_b")), "b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("size_a") + F.col("size_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash long) — 64-bit TF-weighted sign hash of word tokens."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_cols = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                toks = _word_split(text or "")
                if not toks:
                    ids.append(doc_id)
                    hashes.append(0)
                    continue
                s = pd.Series(toks).value_counts()
                base = _stable_u64(pd.Series(s.index))
                bits = ((base[:, None] >> bit_cols[None, :]) & 1).astype(np.int64)
                weights = s.values.astype(np.int64)[:, None]
                acc = (np.where(bits == 1, weights, -weights)).sum(axis=0)
                h = np.uint64(0)
                for k in np.nonzero(acc > 0)[0]:
                    h |= np.uint64(1) << np.uint64(k)
                ids.append(doc_id)
                hashes.append(int(h.astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "simhash": hashes})

    return _spread(df.select(F.col(id_col).alias(id_col), F.col(text_col))).mapInPandas(
        gen, schema="doc_id long, simhash long"
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Scale path: block on 4 × 16-bit bands (pigeonhole — any pair within
    hamming ≤ 3 shares at least one exact band), then verify with bit_count."""
    sigs = simhash_signatures(df, id_col, text_col)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = bands.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "key")
    b = bands.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )

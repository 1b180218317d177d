"""Deterministic, engine-independent sampling and dataset splits.

Training-data pipelines need REPRODUCIBLE corpus subsets: the train/val/test
assignment of a document must not change when the cluster size, partition
layout, Spark version, or run date changes, and an independent system (the
labeling pipeline, the eval harness, a DuckDB audit query) must be able to
re-derive it. ``rand(seed)`` fails all of that — it is seeded per-partition,
so any repartition reshuffles the sample. Hashing the document KEY fails
none of it.

The bucket function is the first 8 hex chars of md5(key-as-string) read as
an integer, mod ``n_buckets`` — chosen over xxhash64/crc32 because md5 is
bit-identical in every engine this repo touches (Spark `md5`, DuckDB `md5`,
Python `hashlib`), which makes every operator here fully oracle-checkable.
md5 speed is irrelevant at one hash per ROW (the tokenizer hashes per
token); the scan stays whole-stage-codegen JVM expressions with zero
shuffles — sampling 100 TB is a map-only job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 1_000_000


def hash_bucket(key: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from md5 of the key.

    DuckDB twin: ``('0x' || substr(md5(key::VARCHAR), 1, 8))::UBIGINT %
    n_buckets``. 8 hex chars = 32 uniform bits; modulo bias is < 2.4e-4 for
    the default million buckets and irrelevant for sampling."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by key hash.

    Unlike ``df.sample``, membership is a pure function of the key: stable
    under repartition, resumable across runs, and consistent across tables
    sharing the key (sampling documents and their embeddings with the same
    rate+key selects the SAME entities — how you subsample a joined corpus
    without a join)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(round(rate * DEFAULT_BUCKETS))
    return df.filter(hash_bucket(F.col(key_col)) < cut)


def split_column(
    key: Column, weights: dict[str, float], n_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Split-name column from cumulative bucket thresholds over the key hash.

    Weights are normalized; boundaries are rounded half-up in cumulative
    space so they sum exactly to ``n_buckets`` and every bucket maps to
    exactly one split (no gaps, no overlaps). Split order follows dict
    order, so the same dict reproduces the same assignment forever."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = hash_bucket(key, n_buckets)
    names = list(weights)
    cuts, acc = [], 0.0
    for name in names:
        acc += weights[name] / total
        cuts.append(min(n_buckets, int(round(acc * n_buckets))))
    cuts[-1] = n_buckets
    # chained WHEN: first matching (lowest) boundary wins
    expr = None
    for name, cut in zip(names, cuts):
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def deterministic_split(
    df: DataFrame, weights: dict[str, float], key_col: str = "doc_id"
) -> DataFrame:
    """``df`` plus a ``split`` column ('train'/'val'/... per ``weights``).

    The assignment is a pure function of the key and the weights dict: the
    val set stays the val set across reruns, engines, and cluster sizes —
    the property that keeps eval data out of training data for the life of
    a corpus."""
    return df.withColumn("split", split_column(F.col(key_col), weights))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep ~rates[stratum] of each
    stratum's rows by key hash (strata not in ``rates`` keep
    ``default_rate``).

    The training-mix primitive: up-weight scarce languages/domains and
    down-weight head ones with REPRODUCIBLE membership — same key, same
    rates, same subset, on any engine at any cluster size. Map-only: the
    rate lookup is a literal CASE over the stratum column, the membership
    test one hash compare; no shuffle, no join."""
    for name, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    bucket = hash_bucket(F.col(key_col))
    cut = F.lit(int(round(default_rate * DEFAULT_BUCKETS)))
    for name, rate in rates.items():
        cut = F.when(
            F.col(stratum_col) == name,
            F.lit(int(round(rate * DEFAULT_BUCKETS))),
        ).otherwise(cut)
    return df.filter(bucket < cut)


def mix_corpora(
    parts: "dict[str, tuple[DataFrame, float]]",
    key_col: str = "doc_id",
) -> DataFrame:
    """Weighted multi-corpus training mix: each named corpus appears
    ``weight`` epochs — full copies for the integer part, a deterministic
    key-hash subset for the fractional part ("2 epochs of wiki + 0.25 of
    web"). Output = union of the parts with ``corpus`` and ``epoch``
    columns, so every emitted row's provenance survives into the mix.

    Membership of the fractional epoch hashes (corpus, epoch, key), NOT
    the bare key: the partial epoch of one corpus is uncorrelated with its
    other epochs, with other corpora, and with any `deterministic_sample`
    downstream — re-running the mix at any cluster size reproduces the
    identical multiset of rows. Map-only per part (explode over epoch
    indices + one hash compare); the union adds no exchange."""
    out = None
    for name, (df, weight) in parts.items():
        if weight < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {weight}")
        full = int(weight)
        frac = weight - full
        frac_cut = int(round(frac * DEFAULT_BUCKETS))
        n_epochs = full + (1 if frac_cut > 0 else 0)
        if n_epochs == 0:
            continue
        part = df.withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1)))
        )
        if frac_cut > 0:
            salted = F.concat_ws(
                ":", F.lit(name), F.col("epoch"), F.col(key_col)
            )
            part = part.filter(
                (F.col("epoch") < full) | (hash_bucket(salted) < frac_cut)
            )
        part = part.withColumn("corpus", F.lit(name))
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("mix_corpora needs at least one part with weight > 0")
    return out


def take_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    key_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Select a deterministic subset of rows whose ``token_col`` sums to at
    most ``budget``, filling in hash-of-key order — "give me the first
    1T tokens of this corpus", reproducibly.

    A naive global cumulative sum is a single-partition window — the one
    plan shape that cannot scale. This runs TWO passes, both shuffle-light:

    1. aggregate tokens per md5 bucket (one shuffle to ≤ n_buckets rows),
       collect the per-bucket histogram (bounded: n_buckets rows, not
       corpus rows) and find on the driver the boundary bucket B where the
       cumulative sum crosses the budget;
    2. keep every row with bucket < B (a map-only filter), plus a strict
       key-ordered prefix of bucket B itself up to the remainder — an
       ORDER BY over ONE bucket (~corpus/n_buckets rows), not the corpus.

    The subset is a pure function of (keys, token counts, budget,
    n_buckets): stable across engines, partitionings, and cluster sizes.
    Rows never split, and the kept set is a strict prefix of the
    (bucket, key) order — two engines can never disagree about
    membership."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    bucket = hash_bucket(F.col(key_col), n_buckets).alias("__bucket")
    hist = (
        df.select(bucket, F.col(token_col).alias("__t"))
        .groupBy("__bucket")
        .agg(F.sum("__t").alias("__tokens"))
        .orderBy("__bucket")
        .collect()
    )
    acc = 0
    boundary = None  # first bucket NOT fully included
    for r in hist:
        if acc + r["__tokens"] > budget:
            boundary = int(r["__bucket"])
            break
        acc += int(r["__tokens"])
    if boundary is None:
        return df  # whole corpus fits
    whole = df.filter(hash_bucket(F.col(key_col), n_buckets) < boundary)
    # partial bucket: cumulative sum in key order WITHIN the one bucket —
    # a window over ~|corpus|/n_buckets rows, not a global sort
    remainder = budget - acc
    from pyspark.sql import Window

    w = Window.orderBy(key_col).rowsBetween(Window.unboundedPreceding, 0)
    part = (
        df.filter(hash_bucket(F.col(key_col), n_buckets) == boundary)
        .withColumn("__cum", F.sum(token_col).over(w))
        .filter(F.col("__cum") <= remainder)
        .drop("__cum")
    )
    return whole.unionByName(part)

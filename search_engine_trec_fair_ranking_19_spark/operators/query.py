"""Query-time retrieval — the Spark rebuild of `Search.search()` →
`Retrieval.getRankedResults()` (SURVEY.md §3.2).

Plan shape per query (all stock DataFrame ops + one Arrow decode UDF):

  tiny query-term DF (driver)  --broadcast-->  join postings blocks on term
      (parquet row-group pruning via the term-sorted layout + pushed IN filter)
  → decode blocks (vectorized pandas UDF) → explode (JVM)
  → per-(term,doc) score expression (whole-stage codegen)
  → groupBy(docid).agg(sum)  [sparse hash agg — replaces the reference's dense
      double[N] arrays, `OkapiBM25P.java:28-29,40-43`, impossible at 10^12 docs]
  → max-normalize → optional PageRank blend (`Retrieval.sort:71-116`)
  → orderBy(desc(score), asc(docid)).limit(k)   [TakeOrderedAndProject =
      per-partition bounded heap + driver merge; tie-break is rank-critical]

BM25+ (`OkapiBM25P.java:36-106`): every doc matching ≥1 term gets the constant
Σ_j idf_j (the δ=1 term for ALL query terms), plus idf_j·f_j(k1+1)/(f_j+B) for
matched terms. The constant is a driver-side scalar — no per-term work for
unmatched terms, exactly matching the reference's math.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis.tokenizer import analyze_query
from ..config import EngineConfig
from ..functions.codec import decode_block
from ..oracle.engine import merge_terms
from .index_build import IndexTables

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

_DECODE_SCHEMA = "docids array<long>, tfs array<long>, dls array<long>"
_decode_udf_cached = None


def _decode_udf():
    """Block-decode pandas UDF (built lazily: registration needs a session)."""
    global _decode_udf_cached
    if _decode_udf_cached is None:

        def decode(gaps: pd.Series, tfs: pd.Series, dls: pd.Series) -> pd.DataFrame:
            out = {"docids": [], "tfs": [], "dls": []}
            for g, t, d in zip(gaps, tfs, dls):
                docids, tf_arr, dl_arr = decode_block(bytes(g), bytes(t), bytes(d))
                out["docids"].append(docids)
                out["tfs"].append(tf_arr)
                out["dls"].append(dl_arr)
            return pd.DataFrame(out)

        _decode_udf_cached = F.pandas_udf(decode, _DECODE_SCHEMA)
    return _decode_udf_cached


@dataclass
class PreparedQuery:
    """Analyzed query + vocabulary lookups (J1) — all driver-side, tiny."""

    terms: list[tuple[str, float]]  # merged (term, weight), first-occurrence order
    dfs: list[int]
    idfs: list[float]
    n_docs: int
    avgdl: float


def prepare_query(
    spark: SparkSession,
    tables: IndexTables,
    query: str,
    config: EngineConfig,
) -> PreparedQuery:
    stats = tables.collection_stats(spark)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    terms = merge_terms(
        [
            (t, 1.0)
            for t in analyze_query(query, config.use_stemmer, config.use_stopwords)
        ]
    )
    dfs_found: dict[str, int] = {}
    if terms:
        # J1: query terms ⋈ vocabulary. The IN filter is pushed into the scan;
        # misses get DF=0 (`Indexer.getDFs:991-1005`).
        rows = (
            tables.vocabulary(spark)
            .filter(F.col("term").isin([t for t, _ in terms]))
            .collect()
        )
        dfs_found = {r["term"]: r["df"] for r in rows}
    dfs = [int(dfs_found.get(t, 0)) for t, _ in terms]
    idfs = [math.log(n_docs / (1.0 + df)) for df in dfs]
    return PreparedQuery(terms, dfs, idfs, n_docs, avgdl)


def matched_postings(
    spark: SparkSession, tables: IndexTables, terms: list[str]
) -> DataFrame:
    """J2: postings blocks of the query terms, decoded and exploded to
    (term, docid, tf, dl) rows."""
    blocks = tables.postings(spark).filter(F.col("term").isin(terms))
    dec = blocks.withColumn("dec", _decode_udf()("gaps", "tfs", "dls"))
    return dec.select(
        "term",
        F.explode(
            F.arrays_zip(
                F.col("dec.docids").alias("docid"),
                F.col("dec.tfs").alias("tf"),
                F.col("dec.dls").alias("dl"),
            )
        ).alias("p"),
    ).select(
        "term",
        F.col("p.docid").alias("docid"),
        F.col("p.tf").alias("tf"),
        F.col("p.dl").alias("dl"),
    )


def _terms_df(spark: SparkSession, pq: PreparedQuery) -> DataFrame:
    return spark.createDataFrame(
        [
            (t, w, idf)
            for (t, w), idf in zip(pq.terms, pq.idfs)
        ],
        "term string, weight double, idf double",
    )


def _finalize(
    spark: SparkSession,
    tables: IndexTables,
    raw_scores: DataFrame,  # (docid, raw)
    k: int | None,
    pagerank_weight: float,
) -> DataFrame:
    """Max-normalize, optional PageRank blend, tie-broken top-k
    (`Retrieval.sort:71-116`). Returns a small materialized (docid, score) DF."""
    raw_scores = raw_scores.persist()
    try:
        max_raw = raw_scores.agg(F.max("raw")).head()[0]
        if max_raw is None:
            return spark.createDataFrame([], TOPK_SCHEMA)
        if max_raw <= 0.0:
            # the reference's running max starts at 0 and is forced to 1 when
            # nothing exceeds it (OkapiBM25P.java:91-94, VSM.java:113-116)
            max_raw = 1.0
        scored = raw_scores.withColumn("score", F.col("raw") / F.lit(max_raw))

        if pagerank_weight != 0.0:
            pr = tables.pagerank(spark)
            scored = scored.join(pr, "docid", "left").withColumn(
                "pagerank", F.coalesce(F.col("pagerank"), F.lit(0.0))
            )
            scored = scored.persist()
            max_pr = scored.agg(F.max("pagerank")).head()[0]
            if not max_pr or max_pr == 0.0:
                max_pr = 1.0
            scored = scored.withColumn(
                "score",
                F.col("score") * F.lit(1.0 - pagerank_weight)
                + (F.col("pagerank") / F.lit(max_pr)) * F.lit(pagerank_weight),
            )

        topk = scored.select("docid", "score").orderBy(
            F.desc("score"), F.asc("docid")
        )
        if k is not None:
            topk = topk.limit(k)
        rows = topk.collect()
        return spark.createDataFrame(rows, TOPK_SCHEMA) if rows else spark.createDataFrame([], TOPK_SCHEMA)
    finally:
        raw_scores.unpersist()


def bm25_topk(
    spark: SparkSession,
    tables: IndexTables,
    query: str,
    k: int | None = 10,
    pagerank_weight: float | None = None,
    config: EngineConfig | None = None,
) -> DataFrame:
    """Okapi BM25+ top-k → (docid, score), scores max-normalized to [0,1]."""
    config = config or tables.config
    if pagerank_weight is None:
        pagerank_weight = config.pagerank_weight
    pq = prepare_query(spark, tables, query, config)
    if not pq.terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    k1, b = config.bm25_k1, config.bm25_b
    sum_idf = sum(pq.idfs)

    posting = matched_postings(spark, tables, [t for t, _ in pq.terms])
    terms_df = _terms_df(spark, pq)
    f = F.col("tf") * F.col("weight")
    B = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(pq.avgdl)
    )
    contrib = F.col("idf") * (f * F.lit(k1 + 1.0) / (f + B))
    raw = (
        posting.join(F.broadcast(terms_df), "term")
        .withColumn("contrib", contrib)
        .groupBy("docid")
        .agg((F.sum("contrib") + F.lit(sum_idf)).alias("raw"))
    )
    return _finalize(spark, tables, raw, k, pagerank_weight)


def vsm_topk(
    spark: SparkSession,
    tables: IndexTables,
    query: str,
    k: int | None = 10,
    pagerank_weight: float | None = None,
    config: EngineConfig | None = None,
) -> DataFrame:
    """VSM top-k (`VSM.java:33-129`): query idf = ln(N/(1+DF)); the per-doc norm
    is the index-time vsm_weight (ln(N/DF)) — the reference's inconsistency,
    replicated. Joins doc_stats for (max_tf, vsm_weight) (J3)."""
    config = config or tables.config
    if pagerank_weight is None:
        pagerank_weight = config.pagerank_weight
    pq = prepare_query(spark, tables, query, config)
    if not pq.terms:
        return spark.createDataFrame([], TOPK_SCHEMA)

    max_q_freq = max(w for _, w in pq.terms)
    q_weights = [
        (w / max_q_freq) * idf for (_, w), idf in zip(pq.terms, pq.idfs)
    ]
    q_norm = math.sqrt(sum(w * w for w in q_weights))

    posting = matched_postings(spark, tables, [t for t, _ in pq.terms])
    terms_df = spark.createDataFrame(
        [
            (t, w, idf, qw)
            for (t, w), idf, qw in zip(pq.terms, pq.idfs, q_weights)
        ],
        "term string, weight double, idf double, q_weight double",
    )
    stats = tables.doc_stats(spark).select("docid", "max_tf", "vsm_weight")
    # doc-side weight per (term, doc): (tf*weight/maxTF)·idf, dotted with q_weight
    raw = (
        posting.join(F.broadcast(terms_df), "term")
        .join(stats, "docid")
        .withColumn(
            "contrib",
            F.col("q_weight")
            * (
                (F.col("tf") * F.col("weight") / F.col("max_tf"))
                * F.col("idf")
            ),
        )
        .groupBy("docid")
        .agg(
            (
                F.sum("contrib")
                / (F.first("vsm_weight") * F.lit(q_norm))
            ).alias("raw")
        )
    )
    return _finalize(spark, tables, raw, k, pagerank_weight)


def existential(
    spark: SparkSession,
    tables: IndexTables,
    query: str,
    k: int | None = None,
    config: EngineConfig | None = None,
) -> DataFrame:
    """Existential model (`Existential.java:28-59`): docs containing ANY query
    term, score ≡ 1.0 — semi-join + distinct (J7)."""
    config = config or tables.config
    pq = prepare_query(spark, tables, query, config)
    if not pq.terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    docs = (
        matched_postings(spark, tables, [t for t, _ in pq.terms])
        .select("docid")
        .distinct()
        .withColumn("raw", F.lit(1.0))
    )
    return _finalize(spark, tables, docs.select("docid", "raw"), k, 0.0)


def topk_with_docs(
    spark: SparkSession, tables: IndexTables, topk: DataFrame
) -> DataFrame:
    """F4/J4: project display fields onto a (small) top-k — broadcast join."""
    return (
        F.broadcast(topk)
        .join(tables.doc_ids(spark), "docid", "left")
        .orderBy(F.desc("score"), F.asc("docid"))
    )

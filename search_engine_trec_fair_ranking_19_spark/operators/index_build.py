"""Inverted-index construction — the Spark-first rebuild of `Indexer.index()`
(`T/indexer/Indexer.java:85-236`, lifecycle in SURVEY.md §3.1).

Stage map (reference → here):
  parse + tokenize + partial segment agg   → scan + ``mapInPandas`` tokenizer
                                             (per-doc TF map computed inside the
                                             UDF = A1 without a shuffle)
  200k-doc partial indexes + K-way merge   → ONE shuffle: groupBy(term, block_id)
                                             (`Indexer.java:173-177,307-362` all
                                             collapse into Spark's sort shuffle)
  postings binary blocks                   → delta+varint block rows
  DOCUMENTS_META / INDEX_META              → doc_stats / collection_stats tables
  docID = parse order                      → docid = global rank of url
                                             (deterministic across cluster sizes)

Scale notes (the 100 TB design, see ARCHITECTURE.md):
  * posting blocks are keyed (term, block_id = docid // block_size): a head term
    with 10^9 postings becomes ~10^9/4096 independent shuffle keys — structural
    skew elimination; no single collect_list ever exceeds block_size entries.
  * doc length (dl) and max_tf are computed inside the tokenizer UDF and ride
    along each (docid, term) row, so BM25's doc-length join (`J3`) disappears
    from the query path: blocks inline a dl stream.
  * docid assignment avoids the single-partition global window: range-partition
    by url, count per range, prefix-sum offsets on the driver (P integers),
    then per-partition local row numbers — identical to rank(url) for any
    partitioning.
"""

from __future__ import annotations

import json
import math
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analysis.tokenizer import tf_map
from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.codec import encode_block

TOKENS_SCHEMA = "docid long, term string, tf int, dl int, max_tf int"
BLOCKS_SCHEMA = (
    "term string, block_id long, df int, max_tf int, min_dl int, "
    "gaps binary, tfs binary, dls binary"
)

STAGES = (
    "doc_ids",
    "doc_stats",
    "collection_stats",
    "postings",
    "vocabulary",
)


@dataclass
class IndexTables:
    """Handle to the on-disk index (the rebuild's INDEX_DIR)."""

    path: str
    config: EngineConfig

    def _read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, name))

    def doc_ids(self, spark):  # (docid long, url string)
        return self._read(spark, "doc_ids")

    def doc_stats(self, spark):  # (docid, token_count, max_tf, vsm_weight)
        return self._read(spark, "doc_stats")

    def postings(self, spark):  # BLOCKS_SCHEMA
        return self._read(spark, "postings")

    def vocabulary(self, spark):  # (term, df)
        return self._read(spark, "vocabulary")

    def pagerank(self, spark):  # (docid, pagerank)
        return self._read(spark, "pagerank")

    def collection_stats(self, spark) -> dict:
        # 1-row table, immutable once built — cache on the handle so query
        # paths don't pay a Spark job per query for N/avgdl
        cached = getattr(self, "_cs_cache", None)
        if cached is None:
            cached = self._read(spark, "collection_stats").head().asDict()
            self._cs_cache = cached
        return cached

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.path, "_manifest.json")

    def manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"stages": {}, "config": None}


def assign_doc_ids(webtext: DataFrame, num_ranges: int | None = None) -> DataFrame:
    """(url, ...) → (docid, url, ...) with docid = 1-based global rank of url.

    Rebuild of the reference's parse-order docID (`Indexer.java:96-97,172`) with
    a data-determined order (SURVEY §1.4): rank by url, computed WITHOUT a
    single-partition window — range partition, per-partition counts, driver
    prefix sum, local row_number.
    """
    spark = webtext.sparkSession
    if num_ranges is None:
        num_ranges = max(spark.sparkContext.defaultParallelism, 8)
    ranged = webtext.repartitionByRange(num_ranges, "url")

    pid = F.spark_partition_id()
    counts = (
        ranged.groupBy(pid.alias("pid")).count().orderBy("pid").collect()
    )
    offsets = {}
    running = 0
    for row in counts:
        offsets[row["pid"]] = running
        running += row["count"]
    offsets_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy("url")
    return (
        ranged.withColumn("__pid", pid)
        .withColumn("__local", F.row_number().over(w))
        .withColumn(
            "docid",
            (offsets_map[F.col("__pid")] + F.col("__local")).cast("long"),
        )
        .drop("__pid", "__local")
    )


def tokenize(docs: DataFrame, config: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """(docid, text) → (docid, term, tf, dl, max_tf): the A1 per-doc TF map as a
    mapInPandas (Arrow-batched; the dict-count inner loop is the same code the
    oracle uses, so token parity is by construction)."""
    use_stemmer, use_stopwords = config.use_stemmer, config.use_stopwords

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docids, terms, tfs, dls, mtfs = [], [], [], [], []
            for docid, text in zip(pdf["docid"].values, pdf["text"].values):
                m = tf_map(text or "", use_stemmer, use_stopwords)
                if not m:
                    continue
                dl = sum(m.values())
                mtf = max(m.values())
                for term, tf in m.items():
                    docids.append(docid)
                    terms.append(term)
                    tfs.append(tf)
                    dls.append(dl)
                    mtfs.append(mtf)
            yield pd.DataFrame(
                {"docid": docids, "term": terms, "tf": tfs, "dl": dls, "max_tf": mtfs}
            )

    return docs.select("docid", "text").mapInPandas(gen, schema=TOKENS_SCHEMA)


def build_postings_blocks(
    tokens: DataFrame, config: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(docid, term, tf, dl) → encoded posting-block rows (BLOCKS_SCHEMA).

    ONE shuffle on (term, block_id) replaces the reference's partial-index
    spill + K-way heap merge (`Indexer.java:173-177,307-362,439-469`): Spark's
    sort-based shuffle IS the merge. sort_array keeps blocks docid-ascending
    (within-block order invariant, `Index.java:114-130`)."""
    block_size = config.postings_block_size

    grouped = (
        tokens.withColumn(
            "block_id", (F.col("docid") / F.lit(block_size)).cast("long")
        )
        .groupBy("term", "block_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("docid", "tf", "dl"))
            ).alias("plist"),
            F.count(F.lit(1)).cast("int").alias("df"),
            F.max("tf").cast("int").alias("max_tf"),
            F.min("dl").cast("int").alias("min_dl"),
        )
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("term", "block_id", "df", "max_tf", "min_dl", "gaps", "tfs", "dls")}
            for row in pdf.itertuples(index=False):
                plist = row.plist
                docids = np.fromiter((p["docid"] for p in plist), dtype=np.int64)
                tfs = np.fromiter((p["tf"] for p in plist), dtype=np.int64)
                dls = np.fromiter((p["dl"] for p in plist), dtype=np.int64)
                g, t, d = encode_block(docids, tfs, dls)
                out["term"].append(row.term)
                out["block_id"].append(row.block_id)
                out["df"].append(row.df)
                out["max_tf"].append(row.max_tf)
                out["min_dl"].append(row.min_dl)
                out["gaps"].append(g)
                out["tfs"].append(t)
                out["dls"].append(d)
            yield pd.DataFrame(out)

    return grouped.mapInPandas(encode, schema=BLOCKS_SCHEMA)


def doc_stats_table(tokens: DataFrame, n_docs: int) -> DataFrame:
    """(docid, token_count, max_tf, vsm_weight) — DOCUMENTS_META rebuild.

    vsm_weight is the index-time VSM norm (`Indexer.updateVSMWeights:570-623`):
    sqrt(Σ_t (TF_t · ln(N/DF_t))²) / maxTF — computed with a DF join, all
    closed-form column math."""
    df_per_term = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("term_df"))
    return (
        tokens.join(df_per_term, "term")
        .groupBy("docid")
        .agg(
            F.first("dl").alias("token_count"),
            F.first("max_tf").alias("max_tf"),
            (
                F.sqrt(
                    F.sum(
                        F.pow(
                            F.col("tf")
                            * (F.log(F.lit(float(n_docs)) / F.col("term_df"))),
                            F.lit(2.0),
                        )
                    )
                )
                / F.first("max_tf")
            ).alias("vsm_weight"),
        )
    )


def build_index(
    spark: SparkSession,
    webtext: DataFrame,
    index_dir: str,
    config: EngineConfig = DEFAULT_CONFIG,
    resume: bool = False,
) -> IndexTables:
    """Full index build with per-stage checkpointing + metrics manifest.

    Each stage is an idempotent parquet write; ``resume=True`` skips stages the
    manifest records as complete (the rebuild of the north rule's "resumable
    from per-partition checkpoints" — Spark's unit of recovery is the stage
    output; within a stage, task retry gives per-partition recovery natively).
    """
    os.makedirs(index_dir, exist_ok=True)
    tables = IndexTables(index_dir, config)
    manifest = tables.manifest() if resume else {"stages": {}, "config": None}
    manifest["config"] = {
        "use_stemmer": config.use_stemmer,
        "use_stopwords": config.use_stopwords,
        "bm25_k1": config.bm25_k1,
        "bm25_b": config.bm25_b,
        "postings_block_size": config.postings_block_size,
    }

    def done(stage: str) -> bool:
        return (
            resume
            and manifest["stages"].get(stage, {}).get("status") == "ok"
            and os.path.exists(os.path.join(index_dir, stage, "_SUCCESS"))
        )

    def record(stage: str, t0: float, rows: int | None = None, **extra) -> None:
        manifest["stages"][stage] = {
            "status": "ok",
            "seconds": round(time.time() - t0, 3),
            "rows": rows,
            **extra,
        }
        with open(tables.manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)

    def write(df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(index_dir, name))

    # ---- stage 1: docid assignment (DOCUMENTS_ID rebuild) -----------------
    if not done("doc_ids"):
        t0 = time.time()
        docs = assign_doc_ids(webtext.filter(F.col("url").isNotNull()))
        write(docs.select("docid", "url"), "doc_ids")
        record("doc_ids", t0)

    doc_ids = tables.doc_ids(spark)
    docs = webtext.join(doc_ids, "url")

    # ---- stage 2+3: tokenize → doc_stats + collection_stats ---------------
    tokens = tokenize(docs, config)
    if not (done("doc_stats") and done("collection_stats")):
        t0 = time.time()
        tokens.persist()
        # N counts every parsed doc, including zero-token ones
        # (`Indexer.java:195-196`: N = docs parsed, avgdl = totalTokens / N)
        n_docs = doc_ids.count()
        stats = doc_stats_table(tokens, n_docs)
        write(stats, "doc_stats")
        total_tokens = (
            tables.doc_stats(spark).agg(F.sum("token_count")).head()[0] or 0
        )
        cs = spark.createDataFrame(
            [
                (
                    n_docs,
                    total_tokens / n_docs if n_docs else 0.0,
                    config.use_stemmer,
                    config.use_stopwords,
                )
            ],
            "n_docs long, avgdl double, use_stemmer boolean, use_stopwords boolean",
        )
        write(cs, "collection_stats")
        dt = time.time() - t0
        record("doc_stats", t0, rows=n_docs)
        record(
            "collection_stats",
            time.time(),
            rows=1,
            docs_per_sec=round(n_docs / dt, 1),
        )

    # ---- stage 4: postings blocks (POSTINGS rebuild) -----------------------
    if not done("postings"):
        t0 = time.time()
        blocks = build_postings_blocks(tokens, config)
        # sort by term so parquet row-group min/max stats prune query-term scans
        blocks.repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 8), "term", "block_id"
        ).sortWithinPartitions("term", "block_id").write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, "postings"))
        n_blocks = tables.postings(spark).count()
        record("postings", t0, rows=n_blocks)

    # ---- stage 5: vocabulary (VOCABULARY rebuild) --------------------------
    if not done("vocabulary"):
        t0 = time.time()
        vocab = (
            tables.postings(spark)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        write(vocab, "vocabulary")
        record("vocabulary", t0, rows=tables.vocabulary(spark).count())

    tokens.unpersist()
    return tables

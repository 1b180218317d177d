"""PageRank over the webtext link graph — rebuild of `T/linkAnalysis/
Pagerank.java` (P1-P3 in SURVEY.md §2.9).

Graph build (P1): explode out_links, semi-join targets against doc_ids (drops
dangling targets), drop self-loops and duplicates — the `skipCitation`
cleaning (`Pagerank.java:156-178`). Out-degree = CLEANED out-link count
(`Pagerank.java:92-98`).

Iteration (P2): Jacobi power iteration with sink-mass redistribution and the
reference's convergence rule (every |Δ| ≤ threshold, `Pagerank.java:214-277`):

    new = d · (sink_mass/N + Σ_in old/outdeg_in) + (1-d)/N

Catalyst has no fixpoint operator, so this is a driver loop over DataFrame ops
with ``localCheckpoint`` per iteration to truncate lineage; the convergence
check is the per-iteration action. All joins are plain equi-joins (shuffle on
docid; AQE handles skewed in-degree hubs).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .index_build import IndexTables


def build_edges(
    spark: SparkSession, tables: IndexTables, links: DataFrame
) -> DataFrame:
    """(url, out_links) → cleaned (src, dst) docid edges (P1/F3/J6)."""
    doc_ids = tables.doc_ids(spark)
    exploded = links.select(
        "url", F.posexplode_outer("out_links").alias("pos", "tgt")
    ).filter(F.col("tgt").isNotNull())
    edges = (
        exploded.join(doc_ids, "url")  # src resolution
        .withColumnRenamed("docid", "src")
        .join(
            doc_ids.select(
                F.col("url").alias("tgt"), F.col("docid").alias("dst")
            ),
            "tgt",
        )  # inner join drops targets outside the collection
        .filter(F.col("src") != F.col("dst"))  # self-loops
    )
    # duplicates: reference keeps the first occurrence; edges are unweighted so
    # any single instance is equivalent — dropDuplicates
    return edges.select("src", "dst").dropDuplicates(["src", "dst"])


def graph_stats(
    spark: SparkSession, tables: IndexTables, links: DataFrame
) -> DataFrame:
    """A10 — citations-graph diagnostics, rebuild of
    `T/linkAnalysis/stats/CitationsGraph.calculateGraphStats`
    (`CitationsGraph.java:81-562`): node/edge counts after cleaning, sink
    count, self-loop / dangling-target / duplicate removal counts, degree
    extremes. One-row DataFrame, all plain aggregations."""
    doc_ids = tables.doc_ids(spark)
    n_nodes = doc_ids.count()

    exploded = (
        links.select("url", F.explode_outer("out_links").alias("tgt"))
        .filter(F.col("tgt").isNotNull())
        .join(doc_ids, "url")
        .withColumnRenamed("docid", "src")
    )
    resolved = exploded.join(
        doc_ids.select(F.col("url").alias("tgt"), F.col("docid").alias("dst")),
        "tgt",
        "left",
    ).persist()
    try:
        n_raw = resolved.count()
        n_dangling = resolved.filter(F.col("dst").isNull()).count()
        valid = resolved.filter(F.col("dst").isNotNull())
        n_self = valid.filter(F.col("src") == F.col("dst")).count()
        non_self = valid.filter(F.col("src") != F.col("dst"))
        edges = non_self.select("src", "dst").dropDuplicates(["src", "dst"])
        edges = edges.persist()
        n_edges = edges.count()
        n_dups = n_raw - n_dangling - n_self - n_edges
        out_deg = edges.groupBy("src").count()
        in_deg = edges.groupBy("dst").count()
        n_sinks = n_nodes - out_deg.count()
        max_out = out_deg.agg(F.max("count")).head()[0] or 0
        max_in = in_deg.agg(F.max("count")).head()[0] or 0
        edges.unpersist()
    finally:
        resolved.unpersist()

    return spark.createDataFrame(
        [
            (
                n_nodes,
                n_edges,
                n_sinks,
                n_self,
                n_dangling,
                n_dups,
                int(max_out),
                int(max_in),
            )
        ],
        "n_nodes long, n_edges long, n_sinks long, n_self_loops long, "
        "n_dangling long, n_duplicates long, max_out_deg long, max_in_deg long",
    )


def pagerank_table(
    spark: SparkSession,
    tables: IndexTables,
    links: DataFrame,
    write: bool = True,
) -> DataFrame:
    """Compute PageRank and (optionally) persist it as the `pagerank` table
    (P3's DOCUMENTS_META writeback becomes a standalone (docid, pagerank)
    table). Returns the final (docid, pagerank) DataFrame."""
    cfg = tables.config
    d, eps = cfg.pagerank_damping, cfg.pagerank_threshold
    t0 = time.time()

    nodes = tables.doc_ids(spark).select("docid").localCheckpoint()
    n = nodes.count()
    teleport = (1.0 - d) / n

    edges = build_edges(spark, tables, links).localCheckpoint()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # pre-join degree onto edges once; reused every iteration
    edges_deg = edges.join(out_deg, "src").localCheckpoint()
    sink_nodes = nodes.join(
        out_deg.select(F.col("src").alias("docid")), "docid", "left_anti"
    ).localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    iters = 0
    for _ in range(cfg.pagerank_max_iters):
        iters += 1
        sink_mass = (
            sink_nodes.join(ranks, "docid").agg(F.sum("rank")).head()[0] or 0.0
        )
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["docid"])
            .select(
                F.col("dst").alias("docid"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("docid")
            .agg(F.sum("c").alias("in_sum"))
        )
        new_ranks = (
            nodes.join(contrib, "docid", "left")
            .select(
                "docid",
                (
                    (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(sink_mass / n))
                    * F.lit(d)
                    + F.lit(teleport)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        max_delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "docid")
            .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .head()[0]
        )
        ranks = new_ranks
        if max_delta is not None and max_delta <= eps:
            break

    result = ranks.withColumnRenamed("rank", "pagerank")
    if write:
        result.write.mode("overwrite").parquet(
            os.path.join(tables.path, "pagerank")
        )
        manifest = tables.manifest()
        manifest["stages"]["pagerank"] = {
            "status": "ok",
            "seconds": round(time.time() - t0, 3),
            "rows": n,
            "iterations": iters,
        }
        with open(tables.manifest_path, "w") as f:
            import json

            json.dump(manifest, f, indent=1)
        return tables.pagerank(spark)
    return result

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

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import local_rows_df
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

    return local_rows_df(
        spark,
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


def degree_histograms(
    spark: SparkSession, tables: IndexTables, links: DataFrame
) -> DataFrame:
    """A10 — in/out degree distributions of the cleaned citations graph
    (`CitationsGraph.calculateGraphStats` also emits degree histograms,
    `CitationsGraph.java:81-562`). Returns (direction, degree, n_nodes) rows
    including the degree-0 bucket (sinks / never-cited docs); plain groupBy
    aggregations — two shuffles on bounded keys."""
    doc_ids = tables.doc_ids(spark)
    n_nodes = doc_ids.count()
    edges = build_edges(spark, tables, links).persist()
    try:
        rows = []
        for direction, key in (("out", "src"), ("in", "dst")):
            deg = edges.groupBy(key).agg(F.count(F.lit(1)).alias("degree"))
            hist = (
                deg.groupBy("degree")
                .agg(F.count(F.lit(1)).alias("n_nodes"))
                .withColumn("direction", F.lit(direction))
            )
            n_zero = n_nodes - deg.count()
            zero = local_rows_df(
                spark,
                [(direction, 0, n_zero)], "direction string, degree long, n_nodes long"
            ).filter(F.col("n_nodes") > 0)
            rows.append(hist.select("direction", "degree", "n_nodes").union(zero))
        out = rows[0].union(rows[1])
        return out
    finally:
        edges.unpersist()


def pagerank_table(
    spark: SparkSession,
    tables: IndexTables,
    links: DataFrame,
    write: bool = True,
    max_iters: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Compute PageRank and (optionally) persist it as the `pagerank` table
    (P3's DOCUMENTS_META writeback becomes a standalone (docid, pagerank)
    table). Returns the final (docid, pagerank) DataFrame.

    Cost per iteration is ONE distributed materialization (the
    localCheckpoint of the new rank frame, which carries |Δ| and an is_sink
    flag inline) plus ONE scalar agg reading that checkpoint — max|Δ| for
    the convergence test AND the NEXT iteration's sink mass come out of the
    same pass. (The previous shape ran a separate sink-mass agg and a
    rank-join delta agg per iteration — double the passes; at 10^12 nodes x
    45 iterations that's real money.)

    ``max_iters``/``threshold`` override the config — a negative threshold
    pins an exact iteration count (used by the correctness gate, whose
    DuckDB oracle unrolls the same fixed number of iterations)."""
    cfg = tables.config
    d = cfg.pagerank_damping
    eps = cfg.pagerank_threshold if threshold is None else threshold
    n_iters_max = cfg.pagerank_max_iters if max_iters is None else max_iters
    t0 = time.time()

    nodes = tables.doc_ids(spark).select("docid").localCheckpoint()
    n = nodes.count()
    teleport = (1.0 - d) / n

    edges = build_edges(spark, tables, links).localCheckpoint()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # pre-join degree onto edges once; reused every iteration
    edges_deg = edges.join(out_deg, "src").localCheckpoint()

    ranks = (
        nodes.join(
            out_deg.select(F.col("src").alias("docid"), F.lit(True).alias("__has_out")),
            "docid",
            "left",
        )
        .select(
            "docid",
            F.col("__has_out").isNull().alias("is_sink"),
            F.lit(1.0 / n).alias("rank"),
        )
        .localCheckpoint()
    )
    sink_mass = (
        ranks.agg(F.sum(F.when(F.col("is_sink"), F.col("rank")))).head()[0]
        or 0.0
    )
    iters = 0
    for _ in range(n_iters_max):
        iters += 1
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["docid"])
            .select(
                F.col("dst").alias("docid"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("docid")
            .agg(F.sum("c").alias("in_sum"))
        )
        new_rank = (
            F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(sink_mass / n)
        ) * F.lit(d) + F.lit(teleport)
        new_ranks = (
            ranks.select("docid", "is_sink", F.col("rank").alias("__old"))
            .join(contrib, "docid", "left")
            .select(
                "docid",
                "is_sink",
                new_rank.alias("rank"),
                F.abs(new_rank - F.col("__old")).alias("__delta"),
            )
            .localCheckpoint()
        )
        agg = new_ranks.agg(
            F.max("__delta"),
            F.sum(F.when(F.col("is_sink"), F.col("rank"))),
        ).head()
        max_delta, sink_mass = agg[0], agg[1] or 0.0
        ranks = new_ranks
        if max_delta is not None and max_delta <= eps:
            break
    ranks = ranks.select("docid", "rank")

    result = ranks.withColumnRenamed("rank", "pagerank")
    if write:
        # through the table-IO seam: with an Iceberg backend this is a
        # snapshot commit on the same catalog IndexTables.pagerank() reads
        # from — a direct parquet write here would silently diverge
        tables._io().overwrite(result, "pagerank")
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

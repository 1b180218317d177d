"""docid assignment must be a bijection url ↔ rank(url) at SCALE.

Regression for a silent large-input corruption: `repartitionByRange`
re-samples its range boundaries per compiled job (the sampler is seeded by
the RDD id), so computing per-partition counts in one job and per-partition
row_numbers in another let boundary rows shift partitions between the two —
producing duplicate and skipped docids (~3% collisions at 500k urls).
Small inputs sample exhaustively and never drift, which is why oracle-gate
corpora (500-5000 docs) could not catch it. The fix materializes the ranged
frame once (localCheckpoint) so every downstream job reads the same
partitioning.
"""

from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
    url_rank_ids,
)


def test_docid_bijection_at_scale(spark):
    n = 400_000
    # adversarial url distribution: non-uniform lengths + interleaved
    # prefixes make sampled range bounds less stable than uniform strings
    urls = spark.range(n).select(
        F.concat(
            F.lit("https://example.org/"),
            (F.col("id") % 97).cast("string"),
            F.lit("/"),
            F.format_string("%09d", F.col("id")),
            F.lit("/page.html"),
        ).alias("url")
    )
    ids, running = url_rank_ids(urls, num_ranges=32)
    agg = ids.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("docid").alias("distinct_ids"),
        F.min("docid").alias("lo"),
        F.max("docid").alias("hi"),
    ).head()
    assert running == n
    assert agg["rows"] == n
    assert agg["distinct_ids"] == n, "duplicate docids: range bounds drifted"
    assert agg["lo"] == 1 and agg["hi"] == n

    # rank semantics: docid order == url order on a sample
    sample = ids.orderBy("url").limit(1000).collect()
    docids = [r["docid"] for r in sample]
    assert docids == sorted(docids)
    assert docids[0] == 1

"""Table-IO seam: parquet backend round-trip through build_index, and the
Iceberg backend's catalog guard (the runtime jar is not vendored here, so the
Iceberg path is exercised up to its configuration check)."""

import pytest

from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
    build_index,
)
from search_engine_trec_fair_ranking_19_spark.operators.query import bm25_topk
from search_engine_trec_fair_ranking_19_spark.sources.table_io import (
    IcebergIO,
    ParquetDirIO,
)
from search_engine_trec_fair_ranking_19_spark.sources.webtext import corpus_spark

CFG = EngineConfig(postings_block_size=64)


def test_build_through_explicit_parquet_io(spark, tmp_path):
    webtext = corpus_spark(spark, 80, seed=31, n_partitions=2)
    idx = str(tmp_path / "io_idx")
    io = ParquetDirIO(idx)
    tables = build_index(spark, webtext, idx, CFG, table_io=io)
    assert tables.io is io
    for name in ("doc_ids", "postings", "vocabulary", "doc_stats"):
        assert io.exists(spark, name)
        assert io.read(spark, name).count() > 0
    # the query path reads through the same seam
    assert bm25_topk(spark, tables, "web search", k=5).count() > 0


def test_parquet_io_append_refreshes_readers(spark, tmp_path):
    io = ParquetDirIO(str(tmp_path))
    df = spark.range(5).selectExpr("id AS docid")
    io.overwrite(df, "t")
    first = io.read(spark, "t")
    assert first.count() == 5
    io.append(spark.range(5, 8).selectExpr("id AS docid"), "t")
    assert io.read(spark, "t").count() == 8


def test_iceberg_io_requires_configured_catalog(spark):
    io = IcebergIO(catalog="lake", namespace="idx")
    with pytest.raises(RuntimeError, match="spark.sql.catalog.lake"):
        io.read(spark, "postings")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        io.overwrite(spark.range(1), "postings")
    assert io.qualified("postings") == "lake.idx.postings"


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_io_end_to_end_when_runtime_present(spark, tmp_path):
    """Full build→query through a real Iceberg hadoop catalog. SKIPS when the
    iceberg-spark-runtime jar is absent (this environment vendors no jars and
    has no network) — on any host with the jar on the Spark classpath this
    runs as-is: catalog confs are set at runtime, the warehouse is a tmp dir.
    """
    if not _iceberg_on_classpath(spark):
        pytest.skip("iceberg-spark-runtime jar not on the Spark classpath")
    spark.conf.set(
        "spark.sql.catalog.it_lake", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_lake.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.it_lake.warehouse", str(tmp_path / "warehouse")
    )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS it_lake.idx")
    io = IcebergIO(catalog="it_lake", namespace="idx")
    webtext = corpus_spark(spark, 80, seed=31, n_partitions=2)
    tables = build_index(spark, webtext, str(tmp_path / "ice_idx"), CFG,
                         table_io=io)
    for name in ("doc_ids", "postings", "vocabulary", "doc_stats"):
        assert io.exists(spark, name)
        assert io.read(spark, name).count() > 0
    # overwrite = new snapshot, readers see the replaced table atomically
    io.overwrite(io.read(spark, "doc_ids").limit(10), "doc_ids")
    assert io.read(spark, "doc_ids").count() == 10
    assert bm25_topk(spark, tables, "web search", k=5).count() > 0


# ---------------------------------------------------------------------------
# SnapshotDirIO — atomic snapshot semantics on plain dirs
# ---------------------------------------------------------------------------

from search_engine_trec_fair_ranking_19_spark.sources.table_io import (  # noqa: E402
    SnapshotDirIO,
)


def test_snapshot_io_build_query_resume(spark, tmp_path):
    # the full batch build + query path runs unchanged through the backend,
    # and resume=True over the same dir skips completed stages
    webtext = corpus_spark(spark, 80, seed=31, n_partitions=2)
    idx = str(tmp_path / "snap_idx")
    io = SnapshotDirIO(idx)
    tables = build_index(spark, webtext, idx, CFG, table_io=io)
    assert tables.io is io
    for name in ("doc_ids", "postings", "vocabulary", "doc_stats"):
        assert io.exists(spark, name)
        assert io.read(spark, name).count() > 0
    assert bm25_topk(spark, tables, "web search", k=5).count() > 0

    before = {r["term"]: r["df"] for r in tables.vocabulary(spark).collect()}
    t2 = build_index(
        spark, corpus_spark(spark, 80, seed=31, n_partitions=2), idx, CFG,
        resume=True, table_io=SnapshotDirIO(idx),
    )
    after = {r["term"]: r["df"] for r in t2.vocabulary(spark).collect()}
    assert before == after


def test_snapshot_io_crashed_overwrite_leaves_old_snapshot(spark, tmp_path):
    io = SnapshotDirIO(str(tmp_path))
    io.overwrite(spark.range(5).selectExpr("id AS docid"), "t")
    # simulate a crash AFTER staging but BEFORE the swap: a half-finished
    # overwrite leaves only a .staging dir — readers still see the old table
    spark.range(99).selectExpr("id AS docid").write.mode("overwrite").parquet(
        str(tmp_path / "t.staging")
    )
    assert io.read(spark, "t").count() == 5
    # the next overwrite completes and replaces cleanly
    io.overwrite(spark.range(7).selectExpr("id AS docid"), "t")
    assert io.read(spark, "t").count() == 7


def test_snapshot_io_uncommitted_append_invisible_and_gcd(spark, tmp_path):
    import os

    io = SnapshotDirIO(str(tmp_path))
    io.overwrite(spark.range(5).selectExpr("id AS docid"), "t")
    io.append(spark.range(5, 8).selectExpr("id AS docid"), "t")
    assert io.read(spark, "t").count() == 8

    # simulate a crashed append: stage files for s2 moved in, commit marker
    # NOT advanced — readers must not see them
    staging = str(tmp_path / "fake")
    spark.range(100, 150).selectExpr("id AS docid").write.mode(
        "overwrite"
    ).parquet(staging)
    live = io.location("t")
    for f in os.listdir(staging):
        if f.startswith("part-"):
            os.rename(os.path.join(staging, f), os.path.join(live, "s2-" + f))
    spark.catalog.refreshByPath(live)
    assert io.read(spark, "t").count() == 8  # uncommitted s2- invisible

    # the next append claims s2, GCs the orphans first, and commits
    io.append(spark.range(8, 10).selectExpr("id AS docid"), "t")
    assert io.read(spark, "t").count() == 10
    assert sorted(
        r["docid"] for r in io.read(spark, "t").collect()
    ) == list(range(10))

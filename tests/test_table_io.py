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

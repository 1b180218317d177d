"""Incremental (streaming) index maintenance: BM25 parity with a batch build
over the same corpus, idempotent replay, and compaction exactness."""

import os

import pytest
from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
from search_engine_trec_fair_ranking_19_spark.operators import query as q
from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
    IndexTables,
    build_index,
)
from search_engine_trec_fair_ranking_19_spark.sources.webtext import corpus_spark
from search_engine_trec_fair_ranking_19_spark.streaming.incremental import (
    compact_index,
    ingest_batch,
    start_ingest_stream,
)

CFG = EngineConfig(postings_block_size=64)
N = 240
QUERIES = ["web search engine", "w00000", "running quickly"]


def _scores_by_url(spark, tables, query, k=None):
    topk = q.bm25_topk(spark, tables, query, k=k)
    with_urls = q.topk_with_docs(spark, tables, topk)
    return {r["url"]: round(r["score"], 9) for r in with_urls.collect()}


@pytest.fixture(scope="module")
def batch_tables(spark, tmp_path_factory):
    webtext = corpus_spark(spark, N, seed=77, n_partitions=4)
    return build_index(
        spark, webtext, str(tmp_path_factory.mktemp("batchidx")), CFG
    )


def test_incremental_matches_batch_build(spark, tmp_path, batch_tables):
    """Ingest the same corpus in 3 batches; every BM25 score-by-url must equal
    the from-scratch batch build (N/avgdl/DF are refreshed per batch)."""
    full = corpus_spark(spark, N, seed=77, n_partitions=4)
    # deterministic 3-way split by hash of url
    parts = [
        full.filter(F.abs(F.hash("url")) % 3 == i) for i in range(3)
    ]
    inc_dir = str(tmp_path / "incidx")
    for i, p in enumerate(parts):
        tables = ingest_batch(spark, p, inc_dir, CFG, batch_id=i)

    for query in QUERIES:
        want = _scores_by_url(spark, batch_tables, query)
        got = _scores_by_url(spark, tables, query)
        assert got == want, f"score-by-url mismatch for {query!r}"


def test_ingest_batch_idempotent(spark, tmp_path):
    corpus = corpus_spark(spark, 60, seed=78, n_partitions=2)
    inc_dir = str(tmp_path / "idem")
    t = ingest_batch(spark, corpus, inc_dir, CFG, batch_id=0)
    n1 = t.doc_ids(spark).count()
    # replay the same batch id (foreachBatch failure-replay contract)
    t = ingest_batch(spark, corpus, inc_dir, CFG, batch_id=0)
    assert t.doc_ids(spark).count() == n1
    # same rows under a NEW batch id must also be a no-op (url anti-join)
    t = ingest_batch(spark, corpus, inc_dir, CFG, batch_id=1)
    assert t.doc_ids(spark).count() == n1


def test_compaction_preserves_scores_and_fixes_vsm(spark, tmp_path, batch_tables):
    full = corpus_spark(spark, N, seed=77, n_partitions=4)
    parts = [full.filter(F.abs(F.hash("url")) % 2 == i) for i in range(2)]
    inc_dir = str(tmp_path / "compidx")
    for i, p in enumerate(parts):
        tables = ingest_batch(spark, p, inc_dir, CFG, batch_id=i)

    tables = compact_index(spark, inc_dir, CFG)

    # BM25 unchanged by compaction
    for query in QUERIES[:2]:
        want = _scores_by_url(spark, batch_tables, query)
        got = _scores_by_url(spark, tables, query)
        assert got == want

    # VSM norms now exact: compare doc_stats by url with the batch build
    b = (
        batch_tables.doc_stats(spark)
        .join(batch_tables.doc_ids(spark), "docid")
        .select("url", F.round("vsm_weight", 9).alias("w"))
    )
    i = (
        tables.doc_stats(spark)
        .join(tables.doc_ids(spark), "docid")
        .select("url", F.round("vsm_weight", 9).alias("w"))
    )
    bm = {r["url"]: r["w"] for r in b.collect()}
    im = {r["url"]: r["w"] for r in i.collect()}
    assert im == bm


def test_structured_streaming_ingest(spark, tmp_path, batch_tables):
    """End-to-end through readStream/foreachBatch with availableNow."""
    full = corpus_spark(spark, N, seed=77, n_partitions=4)
    src = str(tmp_path / "src")
    # two parquet files arriving in the source dir
    for i in range(2):
        full.filter(F.abs(F.hash("url")) % 2 == i).select(
            "url", "warc_ts", "html", "text", "lang"
        ).coalesce(1).write.mode("append").parquet(src)

    inc_dir = str(tmp_path / "streamidx")
    sq = start_ingest_stream(
        spark, src, inc_dir, str(tmp_path / "ckpt"), CFG, available_now=True
    )
    sq.awaitTermination(300)
    tables = IndexTables(inc_dir, CFG)
    assert tables.doc_ids(spark).count() == N

    want = _scores_by_url(spark, batch_tables, QUERIES[0])
    got = _scores_by_url(spark, tables, QUERIES[0])
    assert got == want


def test_crash_after_stats_swap_replay_no_double_count(
    spark, tmp_path, monkeypatch, batch_tables
):
    """ADVICE r02: a crash AFTER the collection_stats swap but BEFORE the
    commit record must not double-count the batch on replay (N/avgdl/IDF are
    derived from committed doc_ids, never from the possibly-already-swapped
    stats snapshot)."""
    import search_engine_trec_fair_ranking_19_spark.streaming.incremental as inc

    full = corpus_spark(spark, N, seed=77, n_partitions=4)
    parts = [full.filter(F.abs(F.hash("url")) % 2 == i) for i in range(2)]
    d = str(tmp_path / "crashidx")
    ingest_batch(spark, parts[0], d, CFG, batch_id=0)

    real = inc._record_ingested

    def boom(index_dir, batch_id):
        raise RuntimeError("crash before commit record")

    monkeypatch.setattr(inc, "_record_ingested", boom)
    with pytest.raises(RuntimeError):
        ingest_batch(spark, parts[1], d, CFG, batch_id=1)
    monkeypatch.setattr(inc, "_record_ingested", real)

    tables = ingest_batch(spark, parts[1], d, CFG, batch_id=1)
    assert int(tables.collection_stats(spark)["n_docs"]) == N
    assert tables.doc_ids(spark).count() == N
    for query in QUERIES:
        want = _scores_by_url(spark, batch_tables, query)
        got = _scores_by_url(spark, tables, query)
        assert got == want, f"replay skewed stats for {query!r}"

"""Segmented (checkpoint-resumable) whole-corpus build: BM25 parity with a
one-shot batch build, crash-and-resume from the committed segment boundary,
rollback of a crashed segment's partial appends, and per-segment lineage."""

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
from search_engine_trec_fair_ranking_19_spark.operators import query as q
from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
    build_index,
)
from search_engine_trec_fair_ranking_19_spark.sources.webtext import (
    corpus_spark,
)
from search_engine_trec_fair_ranking_19_spark.streaming.incremental import (
    _batch_prefix,
    _segments_path,
    build_index_segmented,
)

CFG = EngineConfig(postings_block_size=64)
N = 240
QUERIES = ["web search engine", "w00000", "running quickly"]


def _scores_by_url(spark, tables, query, k=None):
    topk = q.bm25_topk(spark, tables, query, k=k)
    with_urls = q.topk_with_docs(spark, tables, topk)
    return {r["url"]: round(r["score"], 9) for r in with_urls.collect()}


@pytest.fixture(scope="module")
def corpus(spark):
    return corpus_spark(spark, N, seed=91, n_partitions=4)


@pytest.fixture(scope="module")
def batch_scores(spark, corpus, tmp_path_factory):
    tables = build_index(
        spark, corpus, str(tmp_path_factory.mktemp("segbatch")), CFG
    )
    return {query: _scores_by_url(spark, tables, query) for query in QUERIES}


def test_segmented_matches_batch_build(spark, corpus, batch_scores, tmp_path):
    idx = str(tmp_path / "segidx")
    tables = build_index_segmented(spark, corpus, idx, n_segments=4, config=CFG)
    for query in QUERIES:
        assert _scores_by_url(spark, tables, query) == batch_scores[query]
    # per-segment lineage: every segment committed with rows + throughput
    with open(_segments_path(idx)) as f:
        lineage = json.load(f)
    assert lineage["n_segments"] == 4
    segs = lineage["segments"]
    assert set(segs) == {"0", "1", "2", "3"}
    assert all(s["status"] == "ok" and s["seconds"] > 0 for s in segs.values())
    assert sum(s["rows"] for s in segs.values()) == N
    assert all(s["docs_per_sec"] > 0 for s in segs.values() if s["rows"])


def test_segmented_resumes_from_committed_segments(
    spark, corpus, batch_scores, tmp_path, monkeypatch
):
    """Crash after segment 1 commits: the re-invocation must ingest ONLY the
    remaining segments (committed ones are skipped, not re-tokenized) and the
    final index must equal the one-shot build."""
    idx = str(tmp_path / "segresume")

    import search_engine_trec_fair_ranking_19_spark.streaming.incremental as inc

    real_ingest = inc.ingest_batch
    calls: list[int] = []

    def crashing_ingest(spark_, batch, index_dir, config, batch_id=None):
        if batch_id == 2:
            raise RuntimeError("simulated crash before segment 2 commits")
        calls.append(batch_id)
        return real_ingest(spark_, batch, index_dir, config, batch_id=batch_id)

    monkeypatch.setattr(inc, "ingest_batch", crashing_ingest)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_index_segmented(spark, corpus, idx, n_segments=4, config=CFG)
    assert calls == [0, 1]

    def spying_ingest(spark_, batch, index_dir, config, batch_id=None):
        calls.append(batch_id)
        return real_ingest(spark_, batch, index_dir, config, batch_id=batch_id)

    monkeypatch.setattr(inc, "ingest_batch", spying_ingest)
    tables = build_index_segmented(spark, corpus, idx, n_segments=4, config=CFG)
    # resume ran exactly the two uncommitted segments
    assert calls == [0, 1, 2, 3]
    for query in QUERIES:
        assert _scores_by_url(spark, tables, query) == batch_scores[query]


def test_segmented_rolls_back_partial_segment(
    spark, corpus, batch_scores, tmp_path
):
    """Partial files from a crashed (uncommitted) segment attempt must be
    rolled back on resume, never double-counted."""
    idx = str(tmp_path / "segrollback")
    # commit segments 0..1 only (n_segments fixed at 3 for the whole build)
    seg = F.pmod(F.xxhash64(F.col("url")), F.lit(3))
    import search_engine_trec_fair_ranking_19_spark.streaming.incremental as inc

    for s in (0, 1):
        inc.ingest_batch(
            spark, corpus.filter(seg == s), idx, CFG, batch_id=s
        )
    # fake a crashed segment-2 attempt: partial parquet junk under its prefix
    junk = os.path.join(idx, "doc_stats", _batch_prefix(2) + "part-junk.parquet")
    with open(junk, "wb") as f:
        f.write(b"not parquet")
    tables = build_index_segmented(spark, corpus, idx, n_segments=3, config=CFG)
    assert not os.path.exists(junk)
    for query in QUERIES:
        assert _scores_by_url(spark, tables, query) == batch_scores[query]


def test_segment_count_change_is_rejected(spark, corpus, tmp_path):
    idx = str(tmp_path / "segcount")
    build_index_segmented(spark, corpus, idx, n_segments=2, config=CFG)
    with pytest.raises(ValueError, match="n_segments"):
        build_index_segmented(spark, corpus, idx, n_segments=3, config=CFG)

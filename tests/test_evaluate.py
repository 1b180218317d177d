"""Evaluation harness (V1-V3 + S9): judgments loader + end-to-end evaluate()
against oracle AP/nDCG on a small corpus."""

import json
import math

import pytest

from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
from search_engine_trec_fair_ranking_19_spark.operators.evaluate import (
    evaluate,
    evaluate_batch,
    read_judgments,
)
from search_engine_trec_fair_ranking_19_spark.operators.index_build import build_index
from search_engine_trec_fair_ranking_19_spark.oracle import engine as oracle
from search_engine_trec_fair_ranking_19_spark.sources.webtext import (
    corpus_pandas,
    corpus_spark,
)

CFG = EngineConfig(postings_block_size=64)


def test_read_judgments_jsonl(spark, tmp_path):
    path = tmp_path / "judgments.jsonl"
    rows = [
        {
            "qid": 1,
            "query": "web search",
            "documents": [
                {"doc_id": "u1", "relevance": 1},
                {"doc_id": "u2", "relevance": 0},
            ],
        },
        {"qid": 2, "query": "page rank", "documents": []},
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows))
    queries, judgments = read_judgments(spark, str(path))
    assert sorted(queries) == [(1, "web search"), (2, "page rank")]
    assert judgments == {1: {"u1": 1, "u2": 0}, 2: {}}


def test_evaluate_matches_oracle_metrics(spark, tmp_path):
    n = 200
    pdf = corpus_pandas(n, seed=31)
    docs = list(zip(pdf["url"], pdf["text"]))
    oidx = oracle.build_index(docs, CFG)
    webtext = corpus_spark(spark, n, seed=31, n_partitions=3)
    t = build_index(spark, webtext, str(tmp_path / "evalidx"), CFG)

    urls = sorted(pdf["url"])
    rel = {u: (1 if i % 4 == 0 else 0) for i, u in enumerate(urls) if i % 2 == 0}
    queries = [(1, "web search"), (2, "w00000"), (3, "zzznotfound")]
    judgments = {qid: rel for qid, _ in queries}

    per_query, summary = evaluate(spark, t, queries, judgments, model="bm25", k=None)
    got = {r["qid"]: r for r in per_query.collect()}

    inv = {d: u for u, d in oidx.doc_id_of_url.items()}
    for qid, qtext in queries:
        ranked = [inv[d] for d, _ in oracle.bm25_topk(oidx, qtext, k=None)]
        exp_ap = oracle.average_precision(ranked, rel)
        exp_nd = oracle.ndcg(ranked, rel)
        if math.isnan(exp_ap):
            assert math.isnan(got[qid]["avep"])
        else:
            assert got[qid]["avep"] == pytest.approx(exp_ap, abs=1e-9)
            assert got[qid]["ndcg"] == pytest.approx(exp_nd, abs=1e-9)

    assert summary["n_queries"] == 3
    assert 0.0 <= summary["avg_avep"] <= 1.0

    # "Average per <rate> results" summary (`ThemisEval.java:169-199`):
    # rate = min(total results, 1M); time = total * rate / total_results
    total_results = sum(r["n_results"] for r in got.values())
    assert summary["total_results"] == total_results
    assert summary["results_rate"] == min(total_results, 1_000_000)
    assert summary["avg_seconds_per_rate_results"] == pytest.approx(
        summary["total_seconds"] / total_results * summary["results_rate"]
    )
    assert summary["total_seconds"] == pytest.approx(
        summary["avg_seconds"] * summary["n_queries"]
    )


def test_evaluate_batch_matches_sequential(spark, tmp_path):
    n = 200
    pdf = corpus_pandas(n, seed=31)
    webtext = corpus_spark(spark, n, seed=31, n_partitions=3)
    t = build_index(spark, webtext, str(tmp_path / "evalbidx"), CFG)

    urls = sorted(pdf["url"])
    rel = {u: (1 if i % 4 == 0 else 0) for i, u in enumerate(urls) if i % 2 == 0}
    queries = [
        (1, "web search"),
        (2, "w00000"),
        (3, "zzznotfound"),       # OOV: empty result set
        (4, "the and of"),        # stopword-only: no terms at all
    ]
    judgments = {1: rel, 2: rel, 3: rel, 4: {}}

    seq, seq_sum = evaluate(spark, t, queries, judgments, model="bm25", k=None)
    bat, bat_sum = evaluate_batch(spark, t, queries, judgments, k=None)
    s = {r["qid"]: r for r in seq.collect()}
    b = {r["qid"]: r for r in bat.collect()}
    assert set(s) == set(b) == {1, 2, 3, 4}
    for qid in s:
        assert b[qid]["n_results"] == s[qid]["n_results"], f"qid {qid}"
        for col in ("avep", "ndcg"):
            if math.isnan(s[qid][col]):
                assert math.isnan(b[qid][col]), f"qid {qid} {col}"
            else:
                assert b[qid][col] == pytest.approx(s[qid][col], abs=1e-9), (
                    f"qid {qid} {col}"
                )
    for key in ("avg_avep", "avg_ndcg", "min_avep", "max_ndcg"):
        if math.isnan(seq_sum[key]):
            assert math.isnan(bat_sum[key])
        else:
            assert bat_sum[key] == pytest.approx(seq_sum[key], abs=1e-9)

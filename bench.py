"""Benchmark harness (driver contract).

Runs the headline pipeline at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Stages timed:
  * index_build     — full inverted-index build over the documents table
                      (fresh dir each run; docs/sec derived)
  * bm25/vsm/ex     — retrieval latency per query (the reference's headline
                      metric is s/query, BASELINE.md)
  * dedup_minhash   — MinHash+LSH near-dup sweep
  * ann_brute       — exact cosine scan
  * text_quality    — language-ID + quality scan
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.entry_queries import (
    GATE_CONFIG,
    documents_as_webtext,
    load_documents,
    load_embeddings,
)
from search_engine_trec_fair_ranking_19_spark.functions import text_analysis as ta
from search_engine_trec_fair_ranking_19_spark.operators import dedup, similarity
from search_engine_trec_fair_ranking_19_spark.operators import query as q
from search_engine_trec_fair_ranking_19_spark.operators.index_build import build_index
from search_engine_trec_fair_ranking_19_spark.session import get_spark

BM25_QUERIES = [
    "spark shuffle partition table",
    "query data column engine",
    "window batch row",
    "hash join scan",
    "fast slow value key",
]


def _host_fault_mbps(mb: int = 100) -> float:
    """First-touch page-fault throughput of the VM right now (MB/s).

    The sandbox host's on-demand memory path degrades transiently by >100x
    (committed probes: 6 MB/s to 5.9 GB/s within minutes). Recording it with
    every bench run lets a reader tell a slow CODE path from a slow HOST
    window (see BENCH/BASELINE.md protocol notes)."""
    import numpy as np

    t0 = time.time()
    a = np.empty(mb * 1_000_000, dtype=np.uint8)
    a[::4096] = 1
    dt = time.time() - t0
    del a
    return round(mb / dt, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    health_before = _host_fault_mbps()
    spark = get_spark(app_name="themis-bench")
    timings: dict[str, float] = {}
    t_all = time.time()

    docs = load_documents(spark, sf_dir)
    n_docs = docs.count()

    # ---- index build ------------------------------------------------------
    index_dir = tempfile.mkdtemp(prefix="themis_bench_index_")
    try:
        t0 = time.time()
        tables = build_index(
            spark, documents_as_webtext(docs), index_dir, GATE_CONFIG
        )
        timings["index_build"] = time.time() - t0

        # ---- retrieval ----------------------------------------------------
        # warm-up (JIT/UDF worker spin-up) excluded from per-query numbers
        q.bm25_topk(spark, tables, "warm up query", k=10)
        for i, text in enumerate(BM25_QUERIES, 1):
            t0 = time.time()
            q.bm25_topk(spark, tables, text, k=20).collect()
            timings[f"bm25_q{i}"] = time.time() - t0
        # WAND with the PRODUCTION threshold: below the measured crossover
        # (BENCH/wand_crossover.json) queries route to the exhaustive plan;
        # the per-query fallback flag is recorded so the report shows which
        # path actually ran (pruned vs fallback)
        from search_engine_trec_fair_ranking_19_spark.config import EngineConfig

        wand_cfg = GATE_CONFIG.with_(
            wand_min_postings=EngineConfig().wand_min_postings
        )
        wand_paths = {}
        for i, text in enumerate(BM25_QUERIES, 1):
            stats: dict = {}
            t0 = time.time()
            q.bm25_topk_wand(
                spark, tables, text, k=20, config=wand_cfg, stats=stats
            ).collect()
            timings[f"wand_q{i}"] = time.time() - t0
            wand_paths[f"wand_q{i}"] = stats.get("fallback", "wand")
        t0 = time.time()
        q.vsm_topk(spark, tables, BM25_QUERIES[0], k=20).collect()
        timings["vsm_q1"] = time.time() - t0
        t0 = time.time()
        q.existential(spark, tables, BM25_QUERIES[2]).count()
        timings["existential"] = time.time() - t0
        # the whole BM25 query set as ONE plan — compare against
        # sum(bm25_q*) to read the batch amortization directly
        t0 = time.time()
        q.bm25_topk_batch(
            spark, tables, list(enumerate(BM25_QUERIES, 1)), k=20
        ).collect()
        timings["bm25_batch_5q"] = time.time() - t0
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    # ---- dedup + similarity + text analysis -------------------------------
    # Each stage is timed as the MIN over two back-to-back runs. The host's
    # first-touch page-fault throughput swings >100x on a minutes timescale
    # (see BENCH/BASELINE.md); a single cold run can land entirely inside a
    # collapsed window and measure the host, not the code (observed: the
    # same minhash sweep at 3.1s and 32.8s minutes apart). Min-of-2 in one
    # session keeps the number about the plan; both runs are reported.
    run_pairs: dict[str, list[float]] = {}

    def timed2(name: str, fn) -> None:
        runs = []
        for _ in range(2):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        run_pairs[name] = [round(r, 3) for r in runs]
        timings[name] = min(runs)

    timed2(
        "dedup_minhash",
        lambda: dedup.minhash_dedup_pairs(
            docs, num_hashes=64, num_bands=16, threshold=0.5
        ).count(),
    )
    timed2("dedup_exact", lambda: dedup.exact_duplicates(docs).count())

    emb = load_embeddings(spark, sf_dir)
    qvec = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    timed2(
        "ann_brute_force",
        lambda: similarity.brute_force_topk(emb, qvec, k=10).collect(),
    )

    timed2(
        "text_quality_scan",
        lambda: docs.select(
            ta.lang_id(F.col("text")).alias("lang"),
            ta.quality_score(F.col("text")).alias("quality"),
        )
        .agg(F.count(F.lit(1)), F.avg("quality"))
        .collect(),
    )

    total = time.time() - t_all
    bm25_times = sorted(v for k, v in timings.items() if k.startswith("bm25_q"))
    wand_times = sorted(v for k, v in timings.items() if k.startswith("wand_q"))
    result = {
        "metric": "index_build_plus_retrieval_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "n_docs": n_docs,
        "index_docs_per_sec": round(n_docs / timings["index_build"], 1),
        "bm25_p50_sec": round(bm25_times[len(bm25_times) // 2], 3),
        "wand_p50_sec": round(wand_times[len(wand_times) // 2], 3),
        "wand_paths": wand_paths,
        "post_index_stage_runs": run_pairs,
        "host_fault_mbps": [health_before, _host_fault_mbps()],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Per-stage diagnosis of the 1 vs 4 EXECUTOR scaling gap (not a benchmark).

`BENCH/cluster_scaling_1c.json` measures 0.754 efficiency 1→4 single-core
executors — ~18s of the 4-executor arm's 71.7s is not parallelized. This tool
runs ONE build per arm against the running standalone cluster (start with
`CORES_PER_WORKER=1 tools/start_cluster.sh`), keeps the build manifest, and
prints the per-stage seconds side by side, plus two isolation probes:

  * tokenize_count_sec — `tokenize(docs).count()` alone (the Python-UDF scan,
    the most parallel phase) to separate map-scan scaling from reduce scaling
  * query_sec — the BM25 query loop (fixed-latency, driver-coordinated)

Diagnostic only: single un-gated runs, no pairing — use the per-stage RATIOS
within one host window, not the absolute times.

Usage:  python tools/cluster_stage_profile.py [--docs 500000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.cluster_scaling_bench import CORES_PER_EXECUTOR, cluster_session
from tools.scaling_bench import QUERIES, _gen_corpus, host_fault_mbps


def profile_arm(cores_max: int, corpus_path: str, warmup_path: str) -> dict:
    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators import query as q
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
        tokenize,
        url_rank_ids,
    )

    spark = cluster_session(cores_max, f"stage-profile-{cores_max}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        cfg = EngineConfig()
        wdir = tempfile.mkdtemp(prefix=f"prof_warm_{cores_max}_", dir="/dev/shm")
        try:
            build_index(spark, spark.read.parquet(warmup_path), wdir, cfg)
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

        webtext = spark.read.parquet(corpus_path)

        # isolation probe 1: the tokenizer scan alone (no shuffle, no write)
        t0 = time.time()
        tokenize(webtext.selectExpr("url", "text", "0L as docid"), cfg).count()
        tokenize_sec = time.time() - t0

        # isolation probe 2: docid ranking alone (range shuffle + counts
        # collect + window — the driver-coordinated stage)
        t0 = time.time()
        ids, _, _ = url_rank_ids(webtext)
        ids.count()
        url_rank_sec = time.time() - t0

        index_dir = tempfile.mkdtemp(
            prefix=f"prof_idx_{cores_max}_", dir="/dev/shm"
        )
        try:
            t0 = time.time()
            tables = build_index(spark, webtext, index_dir, cfg)
            build_sec = time.time() - t0
            with open(tables.manifest_path) as f:
                stages = {
                    k: v["seconds"]
                    for k, v in json.load(f)["stages"].items()
                }
            q.bm25_topk(spark, tables, "warm up", k=10)
            t0 = time.time()
            for text in QUERIES:
                q.bm25_topk(spark, tables, text, k=20).collect()
            query_sec = time.time() - t0
        finally:
            shutil.rmtree(index_dir, ignore_errors=True)
        return {
            "executors": cores_max // CORES_PER_EXECUTOR,
            "cores_max": cores_max,
            "build_sec": round(build_sec, 3),
            "stages": stages,
            "unattributed_sec": round(build_sec - sum(stages.values()), 3),
            "tokenize_count_sec": round(tokenize_sec, 3),
            "url_rank_sec": round(url_rank_sec, 3),
            "query_sec": round(query_sec, 3),
            "fault_mbps": round(host_fault_mbps(16), 1),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500000)
    args = ap.parse_args()
    corpus = _gen_corpus(args.docs)
    warmup = _gen_corpus(20000)
    low, high = CORES_PER_EXECUTOR, CORES_PER_EXECUTOR * 4
    out = {}
    for cores in (low, high):
        out[str(cores)] = profile_arm(cores, corpus, warmup)
        print(json.dumps(out[str(cores)]), flush=True)
    lo, hi = out[str(low)], out[str(high)]
    print("\nstage            low(s)    high(s)   speedup  eff")
    rows = [("build_total", lo["build_sec"], hi["build_sec"])]
    rows += [(k, lo["stages"][k], hi["stages"][k]) for k in lo["stages"]]
    rows += [
        ("unattributed", lo["unattributed_sec"], hi["unattributed_sec"]),
        ("tokenize_count", lo["tokenize_count_sec"], hi["tokenize_count_sec"]),
        ("url_rank", lo["url_rank_sec"], hi["url_rank_sec"]),
        ("queries", lo["query_sec"], hi["query_sec"]),
    ]
    for name, a, b in rows:
        sp = a / b if b else float("nan")
        print(f"{name:16s} {a:8.2f} {b:9.2f}  {sp:7.2f}  {sp/4:5.2f}")


if __name__ == "__main__":
    main()

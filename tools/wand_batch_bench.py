"""Measure hybrid WAND routing inside bm25_topk_batch (VERDICT r3 item 4).

A mixed batch — common-term queries (exhaustive regime) plus rare-set
selective queries (WAND's measured win regime, BENCH/wand_crossover.json) —
runs twice over the 2M-doc hapax corpus:

  * all-exhaustive: the router disabled (wand_min_postings = +inf), every
    qid on the shared-scan plan — the round-3 batch behavior;
  * hybrid: the production threshold, the per-qid router sends qualifying
    qids through the batched block-max WAND pass and the rest through the
    shared scan.

Reports min-of-N batch wall times for both, the per-qid routing, and the
batched WAND's (qid, block) survivor counts. Writes
BENCH/wand_batch_hybrid.json. In-flight probes + spread qualify the window
(same constants as every other bench here).

Usage: python tools/wand_batch_bench.py [--docs 2000000] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import (
    ARM_REPRO_MAX,
    HEALTH_FLOOR_MBPS,
    _ArmProber,
)
from wand_crossover_bench import QUERIES, rare_set_queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--attempts", type=int, default=3)
    args = ap.parse_args()

    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators import query as q
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )
    from search_engine_trec_fair_ranking_19_spark.session import get_spark
    from search_engine_trec_fair_ranking_19_spark.sources.webtext import (
        corpus_spark_distributed,
    )

    spark = get_spark(
        app_name="wand-batch-hybrid",
        extra_conf=(
            {"spark.local.dir": "/dev/shm/spark-local"}
            if os.path.isdir("/dev/shm")
            else None
        ),
    )
    n_docs = args.docs
    corpus_path = os.path.join(
        tempfile.gettempdir(), f"scaling_corpus_hapax_{n_docs}.parquet"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_spark_distributed(spark, n_docs, seed=123, hapax=True).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    index_dir = os.path.join(tempfile.gettempdir(), f"wand_hapax_idx_{n_docs}")
    cfg = EngineConfig()
    tables = build_index(
        spark, spark.read.parquet(corpus_path), index_dir, cfg, resume=True
    )
    q.bm25_topk(spark, tables, "warm up", k=10)

    # mixed batch: the crossover bench's common + single-hapax queries
    # (exhaustive regime) and its rare-set queries repeated with distinct
    # qids (WAND regime) — a 24-query batch, half per regime by decode cost
    texts = list(QUERIES) + rare_set_queries(n_docs) * 6
    batch = list(enumerate(texts))
    exhaustive_cfg = cfg.with_(wand_min_postings=1 << 62)
    hybrid_cfg = cfg  # production threshold — the router decides

    def run_once(config) -> float:
        t0 = time.time()
        q.bm25_topk_batch(spark, tables, batch, k=10, config=config).collect()
        return round(time.time() - t0, 3)

    # untimed warmups: both variants' plan shapes JIT before any timed run
    # (a cold first run measured 54.8s vs 33.2s warm for identical work —
    # that asymmetry fails the spread gate as if the window had shifted)
    run_once(exhaustive_cfg)
    run_once(hybrid_cfg)

    # retry whole timed sections until one lands in a stable window (the
    # host collapses on a minutes timescale); keep the best attempt either
    # way, with every attempt's runs committed for the record
    attempts = []
    for _ in range(args.attempts):
        with _ArmProber(interval=4.0) as prober:
            t0 = time.time()
            ex_t, hy_t = [], []
            # ABBA interleave so both variants sample the same window
            for i in range(args.trials):
                order = (
                    [(ex_t, exhaustive_cfg), (hy_t, hybrid_cfg)]
                    if i % 2 == 0
                    else [(hy_t, hybrid_cfg), (ex_t, exhaustive_cfg)]
                )
                for sink, cfg_i in order + order[::-1]:
                    sink.append(run_once(cfg_i))
            t1 = time.time()
        window = prober.window(t0, t1)
        probe_med = statistics.median(window) if window else 0.0
        spread = {
            "exhaustive": round(max(ex_t) / min(ex_t), 3),
            "hybrid": round(max(hy_t) / min(hy_t), 3),
        }
        admissible = probe_med >= HEALTH_FLOOR_MBPS and all(
            s <= ARM_REPRO_MAX for s in spread.values()
        )
        attempts.append(
            {
                "ex_t": ex_t,
                "hy_t": hy_t,
                "probe_med": probe_med,
                "spread": spread,
                "admissible": admissible,
            }
        )
        print(json.dumps(attempts[-1]), flush=True)
        if admissible:
            break
    best = max(
        attempts, key=lambda a: (a["admissible"], a["probe_med"])
    )
    ex_t, hy_t = best["ex_t"], best["hy_t"]
    probe_med, spread = best["probe_med"], best["spread"]
    admissible = best["admissible"]

    stats: dict = {}  # untimed instrumented run for routing + survivors
    q.bm25_topk_batch(
        spark, tables, batch, k=10, config=hybrid_cfg, stats=stats
    ).collect()
    routed = stats.get("paths", {})
    out = {
        "n_docs": n_docs,
        "batch_size": len(batch),
        "n_wand_routed": sum(1 for v in routed.values() if v == "wand"),
        "n_exhaustive_routed": sum(
            1 for v in routed.values() if v == "exhaustive"
        ),
        "exhaustive_batch_sec_runs": ex_t,
        "hybrid_batch_sec_runs": hy_t,
        "exhaustive_batch_sec": min(ex_t),
        "hybrid_batch_sec": min(hy_t),
        "hybrid_wins": min(hy_t) < min(ex_t),
        "batch_pairs_total": stats.get("batch_pairs_total"),
        "batch_pairs_survived": stats.get("batch_pairs_survived"),
        "probe_mbps_median": round(probe_med, 1),
        "run_spread": spread,
        "window_admissible": admissible,
        "all_attempts": [
            {k: v for k, v in a.items() if k != "probe_med"}
            | {"probe_mbps_median": round(a["probe_med"], 1)}
            for a in attempts
        ],
        "admission_params": {
            "health_floor_mbps": HEALTH_FLOOR_MBPS,
            "arm_repro_max": ARM_REPRO_MAX,
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/wand_batch_hybrid.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

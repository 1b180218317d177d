"""The reference-shaped evaluation loop at 500k docs: s/query, batch vs
sequential.

The reference's headline number is an EVALUATION-LOOP metric: 635 TREC
queries ranked one at a time on the 47M-doc corpus at 0.92-3.7 s/query
single-threaded (results/{no_,}stemming/evaluation_*.txt, BASELINE.md).
The driver bench measures the same shape at sf0.1 (5k docs); this tool
measures it at 500k docs — the largest corpus the sandbox benches at —
for both execution shapes:

  * sequential — `evaluate()`: one full ranking per driver round-trip,
    the reference's loop structure (ThemisEval.java:136-180);
  * batched    — `evaluate_batch()`: every query in ONE two-shuffle plan
    (ARCHITECTURE.md §3), the shape a 1000-executor cluster wants.

Judgments are sparse and deterministic (~200 judged urls per qid drawn by
md5 bucket from the corpus, rel alternating by url hash) — qrels-sized,
like the reference's, so `_resolve_judged_docids`'s driver-side pair list
stays O(|judged|), not O(corpus).

Protocol: same admission machinery as every bench here — in-flight
host-fault prober, min-of-2 timed runs per shape, within-shape spread
gate (ARM_REPRO_MAX), attempts until a window admits. Sequential times a
SUBSET of the queries (it is the slow shape; 20 queries ≈ the batch's
whole-set wall) and reports s/query; the batch runs the full set.

Writes BENCH/evaluate_batch_500k.json.

Usage: python tools/evaluate_at_scale.py [--docs 500000] [--queries 100]
                                         [--seq-queries 20] [--attempts 4]
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

from tools.scaling_bench import (
    ARM_REPRO_MAX,
    HEALTH_FLOOR_MBPS,
    _ArmProber,
    _gen_corpus,
)

# same deterministic 3-word rotation as bench.py's eval_query_set, so the
# workload is the driver bench's, just larger
_POOL = sorted(
    {
        w
        for s in (
            "spark shuffle partition table",
            "query data column engine",
            "window batch row",
            "hash join scan",
            "fast slow value key",
        )
        for w in s.split()
    }
)


def query_set(n: int) -> list[tuple[int, str]]:
    m = len(_POOL)
    return [
        (
            i + 1,
            " ".join(
                (_POOL[i % m], _POOL[(2 * i + 1) % m], _POOL[(3 * i + 2) % m])
            ),
        )
        for i in range(n)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--seq-queries", type=int, default=20)
    ap.add_argument("--attempts", type=int, default=4)
    ap.add_argument("--out", default="BENCH/evaluate_batch_500k.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators.evaluate import (
        evaluate,
        evaluate_batch,
    )
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )
    from search_engine_trec_fair_ranking_19_spark.session import get_spark

    # corpus FIRST: _gen_corpus stops the session it generates with
    corpus_path = _gen_corpus(args.docs)
    spark = get_spark(
        app_name="evaluate-at-scale",
        extra_conf=(
            {"spark.local.dir": "/dev/shm/spark-local"}
            if os.path.isdir("/dev/shm")
            else None
        ),
    )
    index_dir = os.path.join(
        tempfile.gettempdir(), f"eval_scale_idx_{args.docs}"
    )
    cfg = EngineConfig()
    tables = build_index(
        spark, spark.read.parquet(corpus_path), index_dir, cfg, resume=True
    )

    # sparse deterministic qrels: one scan collects ~200*queries judged urls
    # (md5-bucketed — the sampling.py function, engine-independent), then
    # each qid takes a rotated 200-url slice; rel alternates by url hash
    n_judged_per_q = 200
    want = n_judged_per_q * 4  # pool >> slice so qids' sets differ
    n_docs = args.docs
    cut = max(1, int(1_000_000 * want / n_docs))
    pool = [
        r["url"]
        for r in (
            tables.doc_ids(spark)
            .select("url")
            .filter(
                F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long")
                % 1_000_000
                < cut
            )
            .orderBy("url")
            .collect()
        )
    ]
    qs = query_set(args.queries)
    judgments = {
        qid: {
            u: (1 if (len(u) + qid) % 2 == 0 else 0)
            for u in (
                pool[(qid * 37 + j) % len(pool)]
                for j in range(n_judged_per_q)
            )
        }
        for qid, _ in qs
    }
    seq_qs = qs[: args.seq_queries]

    def run_batch() -> float:
        t0 = time.time()
        per_query, _ = evaluate_batch(spark, tables, qs, judgments, k=None)
        per_query.collect()
        return round(time.time() - t0, 3)

    # the sequential arm scores ONLY seq_qs: hand it only those qids'
    # judgments, or _resolve_judged_docids resolves all --queries qids'
    # urls inside the timed window and the fixed cost is amortized over
    # fewer queries than the batch arm — biasing s/query in the batch's
    # favor
    seq_judgments = {qid: judgments[qid] for qid, _ in seq_qs}

    def run_seq() -> float:
        t0 = time.time()
        per_query, _ = evaluate(spark, tables, seq_qs, seq_judgments, k=None)
        per_query.collect()
        return round(time.time() - t0, 3)

    # untimed warmups (JIT + caches), then admitted min-of-2 per shape
    run_batch()
    run_seq()
    attempts = []
    for _ in range(args.attempts):
        with _ArmProber(interval=4.0) as prober:
            t0 = time.time()
            # ABBA: batch, seq, seq, batch
            b1 = run_batch()
            s1 = run_seq()
            s2 = run_seq()
            b2 = run_batch()
            t1 = time.time()
        window = prober.window(t0, t1)
        probe_med = statistics.median(window) if window else 0.0
        spread = {
            "batch": round(max(b1, b2) / min(b1, b2), 3),
            "sequential": round(max(s1, s2) / min(s1, s2), 3),
        }
        admissible = probe_med >= HEALTH_FLOOR_MBPS and all(
            s <= ARM_REPRO_MAX for s in spread.values()
        )
        attempts.append(
            {
                "batch_runs": [b1, b2],
                "seq_runs": [s1, s2],
                "probe_mbps_median": round(probe_med, 1),
                "spread": spread,
                "admissible": admissible,
            }
        )
        print(json.dumps(attempts[-1]), flush=True)
        if admissible:
            break
    best = max(attempts, key=lambda a: (a["admissible"], a["probe_mbps_median"]))
    batch_sec = min(best["batch_runs"])
    seq_sec = min(best["seq_runs"])
    out = {
        "n_docs": n_docs,
        "n_queries_batch": len(qs),
        "n_queries_sequential": len(seq_qs),
        "judged_per_query": n_judged_per_q,
        "batch_sec": batch_sec,
        "batch_sec_per_query": round(batch_sec / len(qs), 4),
        "sequential_sec": seq_sec,
        "sequential_sec_per_query": round(seq_sec / len(seq_qs), 4),
        "batch_speedup_per_query": round(
            (seq_sec / len(seq_qs)) / (batch_sec / len(qs)), 2
        ),
        "reference_sec_per_query": "0.92-3.7 (47M docs, single thread; BASELINE.md)",
        "probe_mbps_median": best["probe_mbps_median"],
        "run_spread": best["spread"],
        "window_admissible": best["admissible"],
        "all_attempts": attempts,
        "admission_params": {
            "health_floor_mbps": HEALTH_FLOOR_MBPS,
            "arm_repro_max": ARM_REPRO_MAX,
        },
    }
    print(json.dumps(out, indent=1))
    os.makedirs("BENCH", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

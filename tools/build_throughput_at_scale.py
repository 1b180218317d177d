"""Absolute build throughput one order of magnitude above the largest
committed scale: a 10M-doc single-arm build, admission-gated.

The scaling story is measured at 500k and 1M docs (efficiency splits,
`BENCH/scaling_bench.json` / `BENCH/at_scale_1m.json`); what those records
do not answer is whether the BUILD's absolute shape survives another 10×
— the per-stage plan is designed so nothing is super-linear (one
term-range exchange for postings, data-volume-sized docid ranges, scalar
collects only), and this tool checks that claim with a measurement: two
back-to-back full builds at local[32] (fresh session each; a small warmup
build per session moves JIT/worker-spawn out of the steady state), each
under the in-flight host-fault prober, with the within-pair
reproducibility gate (ARM_REPRO_MAX) on the two walls. Per-stage seconds,
docs/sec, postings/sec, and bytes-compressed-per-partition come straight
from the build's own lineage manifest — the numbers the north rule says
every stage must log. A 3-query BM25 smoke after the second build records
the query floor at this corpus size.

A cheap pre-probe refuses the run in a collapsed host window.

Writes BENCH/build_throughput_10m.json (override with --out).

Usage: python tools/build_throughput_at_scale.py [--docs 10000000]
                                                 [--attempts 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
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
    host_fault_mbps,
)

QUERIES = ["web page search", "query w00210 w00455", "w14230 w16788 w18455"]


def _one_build(cpus: int, corpus_path: str, warmup_path: str) -> dict:
    """One full build in a fresh session; returns wall, the manifest's
    per-stage lineage records, and the query smoke."""
    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators import query as q
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )
    from search_engine_trec_fair_ranking_19_spark.session import get_spark

    shm = os.path.isdir("/dev/shm")
    spark = get_spark(
        app_name=f"build-throughput-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"} if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        cfg = EngineConfig()
        wdir = tempfile.mkdtemp(
            prefix="bt_warm_", dir="/dev/shm" if shm else None
        )
        try:
            build_index(spark, spark.read.parquet(warmup_path), wdir, cfg)
        finally:
            shutil.rmtree(wdir, ignore_errors=True)
        webtext = spark.read.parquet(corpus_path)
        index_dir = tempfile.mkdtemp(
            prefix="bt_idx_", dir="/dev/shm" if shm else None
        )
        try:
            t0 = time.time()
            tables = build_index(spark, webtext, index_dir, cfg)
            build_sec = round(time.time() - t0, 3)
            stages = tables.manifest().get("stages", {})
            n_docs = stages.get("doc_ids", {}).get("rows") or 0
            q.bm25_topk(spark, tables, "warm up", k=10).collect()
            q_secs = []
            for text in QUERIES:
                tq = time.time()
                q.bm25_topk(spark, tables, text, k=20).collect()
                q_secs.append(round(time.time() - tq, 3))
        finally:
            shutil.rmtree(index_dir, ignore_errors=True)
        return {
            "build_sec": build_sec,
            "docs_per_sec": round(n_docs / build_sec, 1),
            "stages": stages,
            "query_sec": dict(zip(QUERIES, q_secs)),
        }
    finally:
        spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--out", default="BENCH/build_throughput_10m.json")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")

    pre = [round(host_fault_mbps(), 1) for _ in range(3)]
    pre_median = sorted(pre)[1]
    print(f"pre-probe fault MB/s: {pre} median {pre_median}", flush=True)
    if pre_median < HEALTH_FLOOR_MBPS:
        print("window collapsed at pre-probe; not attempted")
        return 1

    corpus_path = _gen_corpus(args.docs, cpus=args.cpus)
    warmup_path = _gen_corpus(20000)

    attempts = []
    for _ in range(args.attempts):
        with _ArmProber(interval=8.0) as prober:
            t0 = time.time()
            r1 = _one_build(args.cpus, corpus_path, warmup_path)
            r2 = _one_build(args.cpus, corpus_path, warmup_path)
            t1 = time.time()
        window = prober.window(t0, t1)
        probe_med = statistics.median(window) if window else 0.0
        spread = round(
            max(r1["build_sec"], r2["build_sec"])
            / min(r1["build_sec"], r2["build_sec"]),
            3,
        )
        admissible = probe_med >= HEALTH_FLOOR_MBPS and spread <= ARM_REPRO_MAX
        best = min((r1, r2), key=lambda r: r["build_sec"])
        attempts.append(
            {
                "runs_build_sec": [r1["build_sec"], r2["build_sec"]],
                "spread": spread,
                "probe_mbps_median": round(probe_med, 1),
                "admissible": admissible,
                "best": best,
            }
        )
        print(
            json.dumps(
                {k: v for k, v in attempts[-1].items() if k != "best"}
            ),
            flush=True,
        )
        if admissible:
            break
    top = max(attempts, key=lambda a: (a["admissible"], a["probe_mbps_median"]))
    out = {
        "mode": f"local[{args.cpus}] absolute build throughput, min-of-2",
        "n_docs": args.docs,
        "pre_probe_fault_mbps": pre,
        "build_sec": top["best"]["build_sec"],
        "docs_per_sec": top["best"]["docs_per_sec"],
        "stages": top["best"]["stages"],
        "query_sec": top["best"]["query_sec"],
        "runs_build_sec": top["runs_build_sec"],
        "spread": top["spread"],
        "probe_mbps_median": top["probe_mbps_median"],
        "window_admissible": top["admissible"],
        "all_attempts": [
            {k: v for k, v in a.items() if k != "best"} for a in attempts
        ],
        "admission_params": {
            "health_floor_mbps": HEALTH_FLOOR_MBPS,
            "arm_repro_max": ARM_REPRO_MAX,
        },
        "reference_docs_per_sec": 7880,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "stages"}, indent=1))
    os.makedirs("BENCH", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Per-operator N→4N scaling at 500k docs: span dedup, MinHash-LSH dedup.

The index build carries the north rule's criterion number
(BENCH/BASELINE.md); this tool runs the SAME paired admission protocol
(tools/scaling_bench.py: cheap pre-probe, in-flight fault probes, ABBA
pairs, within-arm reproducibility gate, hardware ceilings) over the other
heavyweight operator families, at the local[1] → local[4] split — the
faithful N→4N-executor analog — so the scaling claim doesn't rest on one
operator's key distribution:

  * ``--op span_dedup`` — `dedup.remove_duplicate_spans` (find duplicated
    k-token windows corpus-wide, merge to spans, rewrite every document):
    2 shuffles over token-count-sized rows keyed by near-unique window
    hashes — the OPPOSITE key distribution of the build's Zipfian terms —
    plus the map-side rewrite. All JVM.
  * ``--op minhash`` — `dedup.minhash_dedup_pairs` (JVM shingle hashing →
    Arrow-batched numpy signature kernel → band buckets → bucket join →
    exact-Jaccard verify): the one heavyweight path where Python workers
    do real per-row work, so its scaling probes the Arrow/Python-worker
    boundary the JVM-only ops never touch.

Both ops run over the synthetic corpus plus a deterministic 5%
syndicated-copy fraction (same text, new url) so the duplicate-handling
stages do real work — the generator's random docs share no long runs.

Usage: python tools/operator_scaling_bench.py [--op span_dedup|minhash]
       [--docs 500000] [--pairs 2] [--k 16] [--out BENCH/<op>_500k.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import (  # noqa: E402
    ARM_REPRO_MAX,
    HEALTH_FLOOR_MBPS,
    _ArmProber,
    _gen_corpus,
    host_fault_mbps,
    hw_cpu_scaling,
    hw_mem_scaling,
)


def _docs_with_dups(spark, corpus_path: str):
    """Corpus + deterministic 5% syndicated-copy fraction (same text, new
    url) — the generator's random docs share no long runs, which would
    let duplicate-handling stages ride empty join sides."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(corpus_path).select(
        F.col("url").alias("doc_id"), F.col("text")
    )
    dups = base.filter(F.xxhash64("doc_id") % 20 == 0).select(
        F.concat(F.col("doc_id"), F.lit("#syndicated")).alias("doc_id"),
        "text",
    )
    return base.unionByName(dups)


def _session(cpus: int, app: str):
    from search_engine_trec_fair_ranking_19_spark.session import get_spark

    extra = (
        {"spark.local.dir": "/dev/shm/spark-local"}
        if os.path.isdir("/dev/shm")
        else None
    )
    spark = get_spark(
        app_name=f"{app}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_arm_span_dedup(cpus: int, corpus_path: str, k: int) -> dict:
    """One span-dedup trial at local[cpus]: fresh context, tiny warmup
    first (JIT + codegen for the window/agg pipeline), then the timed
    full-corpus pass."""
    from pyspark.sql import functions as F

    from search_engine_trec_fair_ranking_19_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    spark = _session(cpus, "span-dedup")
    try:
        docs = _docs_with_dups(spark, corpus_path)
        warm = docs.limit(5000)
        remove_duplicate_spans(warm, k=k).agg(
            F.sum("n_tokens_removed")
        ).collect()
        t0 = time.time()
        row = (
            remove_duplicate_spans(docs, k=k)
            .agg(
                F.sum("n_tokens_removed").alias("removed"),
                F.count(F.lit(1)).alias("docs"),
            )
            .collect()[0]
        )
        dt = time.time() - t0
        return {
            "cpus": cpus,
            "sec": round(dt, 3),
            "docs": row["docs"],
            "tokens_removed": int(row["removed"]),
            "docs_per_sec": round(row["docs"] / dt, 1),
        }
    finally:
        spark.stop()


def run_arm_minhash(cpus: int, corpus_path: str, k: int) -> dict:
    """One MinHash-LSH near-dup sweep at local[cpus]: signatures (Arrow
    numpy kernel) → bands → bucket join → exact-Jaccard verify. Warmup
    spins up the Python workers + Arrow serde before the timed pass.
    ``k`` is unused (the op has its own 64-hash/16-band config — the
    bench-standard parameters bench.py times at sf0.1)."""
    from pyspark.sql import functions as F

    from search_engine_trec_fair_ranking_19_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    spark = _session(cpus, "minhash")
    try:
        docs = _docs_with_dups(spark, corpus_path)
        warm = docs.limit(5000)
        minhash_dedup_pairs(
            warm, num_hashes=64, num_bands=16, threshold=0.5
        ).count()
        n_docs = docs.count()
        t0 = time.time()
        n_pairs = minhash_dedup_pairs(
            docs, num_hashes=64, num_bands=16, threshold=0.5
        ).count()
        dt = time.time() - t0
        return {
            "cpus": cpus,
            "sec": round(dt, 3),
            "docs": n_docs,
            "pairs": n_pairs,
            "docs_per_sec": round(n_docs / dt, 1),
        }
    finally:
        spark.stop()


def run_arm_prepare(cpus: int, corpus_path: str, k: int) -> dict:
    """One full prepare_training_set pass at local[cpus]: decontaminate
    (1%-of-corpus eval set) → curate (lang → quality → exact dedup →
    near-dup clusters over MinHash-LSH pairs) → redact → doc-level split
    → chunk. The composed raw-crawl → training-chunks pipeline, i.e. the
    thing a 100 TB training-data run actually executes end-to-end.

    doc_id = xxhash64(url): prepare's split/cap bookkeeping needs a
    numeric id, and the hash is deterministic and parallel (no global
    row_number window in a bench arm). ``k`` is unused."""
    from pyspark.sql import functions as F

    from search_engine_trec_fair_ranking_19_spark.operators.curate import (
        prepare_training_set,
    )
    from search_engine_trec_fair_ranking_19_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    spark = _session(cpus, "prepare")
    try:
        docs = _docs_with_dups(spark, corpus_path).select(
            F.xxhash64("doc_id").alias("doc_id"),
            "text",
            F.lit("web").alias("source"),
        )
        eval_df = docs.filter(F.col("doc_id") % 100 == 0).select("text")

        def compose(frame):
            return prepare_training_set(
                frame,
                split_weights={"train": 0.9, "val": 0.1},
                max_len=512,
                eval_df=eval_df.limit(500) if frame is not docs else eval_df,
                redact=True,
                langs=("en", "unk"),
                min_quality=0.0,
                pairs=minhash_dedup_pairs(
                    frame, num_hashes=64, num_bands=16, threshold=0.5
                ),
            ).agg(
                F.count(F.lit(1)).alias("chunks"),
                F.sum("n_tokens").alias("tokens"),
            )

        compose(docs.limit(5000)).collect()  # warmup: JIT + Python workers
        n_docs = docs.count()
        t0 = time.time()
        row = compose(docs).collect()[0]
        dt = time.time() - t0
        return {
            "cpus": cpus,
            "sec": round(dt, 3),
            "docs": n_docs,
            "chunks": int(row["chunks"]),
            "tokens": int(row["tokens"]),
            "docs_per_sec": round(n_docs / dt, 1),
        }
    finally:
        spark.stop()


OPS = {
    "span_dedup": run_arm_span_dedup,
    "minhash": run_arm_minhash,
    "prepare": run_arm_prepare,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", choices=sorted(OPS), default="span_dedup")
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--pairs", type=int, default=1)
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"BENCH/{args.op}_{args.docs // 1000}k.json"
    run_arm = OPS[args.op]

    pre = [round(host_fault_mbps(), 1) for _ in range(3)]
    pre_median = sorted(pre)[1]
    print(f"pre-probe fault MB/s: {pre} median {pre_median}", flush=True)
    if pre_median < HEALTH_FLOOR_MBPS:
        print("window collapsed at pre-probe; not attempting", flush=True)
        return 1

    corpus_path = _gen_corpus(args.docs)
    hw = hw_cpu_scaling(args.low, args.high)
    hw_mem = hw_mem_scaling(args.low, args.high)

    pair_rows = []
    accepted = 0
    for i in range(args.pairs * 3):
        if accepted >= args.pairs:
            break
        a, b = (args.low, args.high) if i % 2 == 0 else (args.high, args.low)
        schedule = (a, b, b, a)
        runs: dict[int, list[dict]] = {args.low: [], args.high: []}
        health: dict[int, list[float]] = {args.low: [], args.high: []}
        with _ArmProber() as prober:
            for cpus in schedule:
                t0 = time.time()
                runs[cpus].append(run_arm(cpus, corpus_path, args.k))
                time.sleep(0.1)
                health[cpus] += prober.window(t0, time.time())
        # same-window hardware ceilings: the tool-start measurement can be
        # minutes stale by now, and the stream ceiling is the binding one
        # for bandwidth-bound kernels (BENCH/scaling_2to8_r4.json lesson)
        pair_hw_mem = hw_mem_scaling(args.low, args.high)
        lo = min(runs[args.low], key=lambda r: r["sec"])
        hi = min(runs[args.high], key=lambda r: r["sec"])
        med = {
            c: (statistics.median(s) if s else 0.0) for c, s in health.items()
        }
        spread = {
            c: (
                max(r["sec"] for r in rs) / min(r["sec"] for r in rs)
                if len(rs) > 1
                else 1.0
            )
            for c, rs in runs.items()
        }
        reproducible = all(s <= ARM_REPRO_MAX for s in spread.values())
        ok = (
            all(m >= HEALTH_FLOOR_MBPS for m in med.values()) and reproducible
        )
        accepted += ok
        speedup = lo["sec"] / hi["sec"]
        row = {
            "pair": i,
            "schedule": ",".join(str(c) for c in schedule),
            "sec_runs": {
                str(c): [r["sec"] for r in rs] for c, rs in runs.items()
            },
            "low": lo,
            "high": hi,
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(
                speedup / (args.high / args.low), 3
            ),
            "arm_fault_median": {str(c): round(m, 1) for c, m in med.items()},
            "arm_run_spread": {str(c): round(s, 3) for c, s in spread.items()},
            "arm_runs_reproducible": reproducible,
            "healthy": ok,
            "pair_hw_mem_scaling": pair_hw_mem,
        }
        pair_rows.append(row)
        print(json.dumps(row), flush=True)

    kept = [r for r in pair_rows if r["healthy"]]
    record = {
        "mode": (
            f"{args.op} at {args.docs} docs, "
            f"local[{args.low}] vs local[{args.high}], paired protocol"
        ),
        "op": args.op,
        "n_docs": args.docs,
        "k": args.k,
        "pairs": pair_rows,
        "pairs_healthy": len(kept),
        "scaling_efficiency": (
            round(
                statistics.median(r["scaling_efficiency"] for r in kept), 3
            )
            if kept
            else None
        ),
        "hw_cpu_ceiling": hw,
        "hw_mem_scaling": hw_mem,
        "admission_params": {
            "health_floor_mbps": HEALTH_FLOOR_MBPS,
            "arm_repro_max": ARM_REPRO_MAX,
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "pairs"}))
    return 0 if kept else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Scaling-efficiency bench (north-rule evidence).

The rule's N-vs-4N-executor criterion can't use a real cluster in this
sandbox, so we run the SAME job — full index build + BM25 query set over a
synthetic webtext corpus — at N vs 4N cores (default splits 1:4, 2:8, 4:16)
on the same input, and report throughput at both plus
efficiency = (t_low / t_high) / (cpus_high / cpus_low) per split.

Two sandbox realities shape the protocol (both measured, see
BENCH/BASELINE.md):

1. **SMT ceiling.** The box advertises 32 vCPUs but delivers ~16 physical
   cores × 2 hyperthreads: a pure-CPU multiprocessing probe (no Spark, no
   memory pressure) scales 8→32 workers at only ~0.62 efficiency and 4→16
   at ~0.73-0.83, while 1→4 and 2→8 are near-ideal. A Spark job can never
   beat the hardware curve, and on a REAL cluster going N→4N executors
   adds physical cores — so the small-N splits are the faithful analog,
   and every split is reported next to its own measured hardware ceiling
   (`hw_cpu_scaling`) plus the job/hw ratio.

2. **Host noise windows.** The VM's first-touch page-fault throughput
   swings >100x (6 MB/s … 5.9 GB/s) on a minutes timescale — absolute
   times from different windows are incomparable. So the two arms run as
   back-to-back PAIRS inside ONE process (stop the SparkContext, start the
   next arm's context in the same warm JVM ~seconds later): each pair
   shares its host window and its JIT state, and the per-pair RATIO
   cancels the common-mode noise. Arm order alternates across pairs to
   cancel residual drift. Fault-probes run before/between/after each pair
   so every ratio carries its window context.

Shuffle and index output live on tmpfs: on a real cluster each executor
shuffles to its OWN local disks and writes output to distributed storage —
per-executor I/O bandwidth scales with N. Local mode's single OS disk does
not, so RAM-backed I/O isolates the CPU-scaling signal the criterion is
about.

Usage:
  python tools/scaling_bench.py [--docs 500000] [--pairs 4] [--low 4 --high 16]
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

QUERIES = [
    "web search engine rank",
    "w00001 w00002 spark",
    "index partition shuffle",
    "running quickly computing",
]

# Within-arm reproducibility bound (single source of truth — imported by
# tools/cluster_scaling_bench.py and tools/apply_repro_gate.py). An arm's
# two ABBA runs are identical work; a spread past this means the host
# window shifted mid-pair and the pair's ratio compares two different
# hosts. Calibration: the pairs whose job-side numbers were self-consistent
# (local 1->4, cluster 1-exec committed pairs) spread <=1.38; the rerun
# pairs that demonstrably straddled collapses spread 1.47-3.0. The 2->8 /
# 4->16 local splits recorded spreads of 1.43-2.15 and are REJECTED under
# this bound (see BENCH/BASELINE.md) — the bound is outcome-blind and
# applied uniformly, which costs those splits their headline numbers.
ARM_REPRO_MAX = 1.45


def host_fault_mbps(mb: int = 100) -> float:
    """First-touch page-fault throughput of THIS VM right now (MB/s).

    The sandbox host's on-demand memory path degrades transiently by >100x
    (measured 6 MB/s to 5.9 GB/s for first touch of fresh pages within
    minutes). Every trial records this so bench consumers can tell a slow
    CODE path from a slow HOST window."""
    import numpy as np

    t0 = time.time()
    a = np.empty(mb * 1_000_000, dtype=np.uint8)
    a[::4096] = 1
    dt = time.time() - t0
    del a
    return round(mb / dt, 1)


def _busy(n_iter: int) -> int:
    """Cache-resident integer mixing — CPU-bound, no memory-bandwidth
    component (160 KB working set). Module-level for mp.Pool pickling."""
    import numpy as np

    x = np.arange(20_000, dtype=np.uint64)
    s = 0
    for _ in range(n_iter):
        x = x * np.uint64(6364136223846793005) + np.uint64(
            1442695040888963407
        )
        s ^= int(x[-1])
    return s


def _stream(args):
    """DRAM-streaming worker: read+write over a 256 MB warm working set —
    measures the box's memory BANDWIDTH (no first-touch after warmup)."""
    import numpy as np

    mb, iters = args
    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    t0 = time.time()
    for _ in range(iters):
        np.copyto(b, a)
        b *= 1.0000001
    return (mb * iters * 4) / (time.time() - t0)  # MB touched / s


def _alloc_churn(args):
    """First-touch worker: allocate FRESH pages each iteration and touch one
    byte per page — measures the host's concurrent page-fault path (what
    hash-agg/object-churn kernels stress)."""
    import numpy as np

    mb, iters = args
    t0 = time.time()
    for _ in range(iters):
        a = np.empty(mb * 1024 * 1024, dtype=np.uint8)
        a[::4096] = 1
        del a
    return (mb * iters) / (time.time() - t0)


def hw_mem_scaling(low: int, high: int) -> dict:
    """Memory-subsystem scaling ceiling of this box (no Spark).

    Two regimes a Spark build actually exercises, measured as AGGREGATE
    throughput at `low` vs `high` concurrent workers:
      * stream — warm-page read+write bandwidth (sort/shuffle/scan);
      * alloc  — fresh-page first-touch (agg hash maps, object churn).
    On this VM (measured): stream scales 4→16 at ~0.6 efficiency and alloc
    COLLAPSES ~2x in absolute terms (0.12 efficiency) — any
    allocation-heavy stage is bounded by these curves, while a real N→4N
    EXECUTOR scale-out multiplies memory controllers and page-fault paths
    along with the cores."""
    import multiprocessing as mp

    out = {}
    for name, fn, arg in (
        ("stream", _stream, (256, 4)),
        ("alloc", _alloc_churn, (256, 4)),
    ):
        agg = {}
        for w in (low, high):
            with mp.Pool(w) as p:
                p.map(fn, [(32, 2)] * w)  # warm forks
                rates = p.map(fn, [arg] * w)
                agg[w] = sum(rates)
        out[name] = {
            "low_mbps": round(agg[low], 1),
            "high_mbps": round(agg[high], 1),
            "efficiency": round((agg[high] / agg[low]) / (high / low), 3),
        }
    return out


def hw_cpu_scaling(low: int, high: int) -> dict:
    """Pure-CPU scaling ceiling of this box, no Spark involved.

    Fixed total work split across `low` vs `high` forked workers; ideal
    speedup = high/low. On this VM 8→32 tops out ~2.5x (SMT siblings),
    4→16 reaches ~3.3x. Whatever the job measures is bounded by this."""
    import multiprocessing as mp

    total = 1_600_000
    out = {}
    for w in (low, high):
        per = total // w
        with mp.Pool(w) as p:
            p.map(_busy, [10] * w)  # warm forks
            ts = []
            for _ in range(3):
                t0 = time.time()
                p.map(_busy, [per] * w)
                ts.append(time.time() - t0)
        out[w] = min(ts)
    speedup = out[low] / out[high]
    return {
        "low_workers": low,
        "high_workers": high,
        "low_sec": round(out[low], 2),
        "high_sec": round(out[high], 2),
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (high / low), 3),
    }


def _run_arm(cpus: int, corpus_path: str, warmup_path: str | None = None) -> dict:
    """One build + query trial at local[cpus]; context created and stopped
    here so the caller can alternate arms inside one process/JVM. A small
    warmup build first (when ``warmup_path`` is given) moves one-time costs —
    JIT, Python-worker spawn + imports, first-touch buffer allocation — out
    of the measured steady-state throughput."""
    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators import query as q
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )
    from search_engine_trec_fair_ranking_19_spark.session import get_spark

    extra = (
        {"spark.local.dir": "/dev/shm/spark-local"}
        if os.path.isdir("/dev/shm")
        else None
    )
    spark = get_spark(
        app_name=f"scaling-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        cfg = EngineConfig()
        if warmup_path is not None:
            wdir = tempfile.mkdtemp(
                prefix=f"scaling_warm_{cpus}_",
                dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
            )
            try:
                build_index(spark, spark.read.parquet(warmup_path), wdir, cfg)
            finally:
                shutil.rmtree(wdir, ignore_errors=True)
        webtext = spark.read.parquet(corpus_path)
        n_docs = webtext.count()
        index_dir = tempfile.mkdtemp(
            prefix=f"scaling_idx_{cpus}_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        try:
            t0 = time.time()
            tables = build_index(spark, webtext, index_dir, cfg)
            build_sec = time.time() - t0
            stage_sec = {
                name: s.get("seconds")
                for name, s in tables.manifest().get("stages", {}).items()
            }

            q.bm25_topk(spark, tables, "warm up", k=10)  # worker warm-up
            t0 = time.time()
            for text in QUERIES:
                q.bm25_topk(spark, tables, text, k=20).collect()
            query_sec = time.time() - t0
        finally:
            shutil.rmtree(index_dir, ignore_errors=True)
        return {
            "cpus": cpus,
            "n_docs": n_docs,
            "build_sec": round(build_sec, 3),
            "docs_per_sec": round(n_docs / build_sec, 1),
            "stage_sec": stage_sec,
            "query_sec_total": round(query_sec, 3),
        }
    finally:
        spark.stop()


def _gen_corpus(n_docs: int, cpus: int = 16) -> str:
    from search_engine_trec_fair_ranking_19_spark.session import get_spark

    corpus_path = os.path.join(
        tempfile.gettempdir(), f"scaling_corpus_{n_docs}.parquet"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        from search_engine_trec_fair_ranking_19_spark.sources.webtext import (
            corpus_spark_distributed,
        )

        spark = get_spark(app_name="scaling-gen", master=f"local[{cpus}]")
        corpus_spark_distributed(spark, n_docs, seed=123).write.mode(
            "overwrite"
        ).parquet(corpus_path)
        spark.stop()
    return corpus_path


class _ArmProber:
    """Samples host first-touch throughput every ~8s in a daemon thread WHILE
    an arm runs. Arm-boundary probes miss intra-arm window collapses (round-2
    lesson: a 70s build straddling a 6 MB/s window looks identical, at its
    boundaries, to a clean one) — these in-flight samples are what the
    admission gate judges a pair by."""

    def __init__(self, interval: float = 8.0):
        import threading

        self.samples: list[tuple[float, float]] = []  # (t, MB/s)
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, args=(interval,))
        self._t.daemon = True

    def _loop(self, interval: float) -> None:
        while not self._stop.is_set():
            self.samples.append((time.time(), host_fault_mbps(16)))
            self._stop.wait(interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=30)

    def window(self, t0: float, t1: float) -> list[float]:
        return [round(v, 1) for (t, v) in self.samples if t0 <= t <= t1]


# Admission floor for per-arm MEDIAN in-flight fault throughput. Healthy
# windows on this VM measure 2000-5900 MB/s; degraded ones 6-300. 500 sits
# in the gap: an arm whose median sample clears it spent most of its wall
# time out of the degraded regime.
HEALTH_FLOOR_MBPS = 500.0


def run_split(
    low: int,
    high: int,
    pairs: int,
    corpus_path: str,
    warmup_path: str,
    max_attempts: int | None = None,
) -> dict:
    """Paired-ratio measurement of one N-vs-4N split.

    Pairs run until ``pairs`` of them pass the health admission gate (both
    arms' in-flight median fault probe ≥ HEALTH_FLOOR_MBPS) or
    ``max_attempts`` (default 3x) is hit — the round-2 verdict's "use the
    probes as an admission gate, not a post-hoc caveat". Rejected pairs stay
    in the output, flagged, so the record shows what was excluded and why.

    Each pair runs its arms in an ABBA schedule (A,B,B,A — first arm
    alternates across pairs) and scores each arm by the MIN of its two runs:
    measured r3 data showed a systematic ~20-40% position effect (whichever
    arm ran SECOND in an A,B pair was faster, in both orders, even in later
    pairs whose JVM had seen multiple full builds) that neither arm-order
    alternation nor the fault probe explains. ABBA-min gives both arms a
    late-position run inside the same host window, cancelling the effect
    whatever its cause."""
    max_attempts = max_attempts or pairs * 3
    hw = hw_cpu_scaling(low, high)
    hw_mem = hw_mem_scaling(low, high)
    print(f"hw ceiling {low}->{high}: {json.dumps(hw)}", flush=True)
    print(f"hw mem {low}->{high}: {json.dumps(hw_mem)}", flush=True)

    pair_rows = []
    accepted = 0
    for i in range(max_attempts):
        if accepted >= pairs:
            break
        a, b = (low, high) if i % 2 == 0 else (high, low)
        schedule = (a, b, b, a)
        runs: dict[int, list[dict]] = {low: [], high: []}
        arm_health: dict[int, list[float]] = {low: [], high: []}
        with _ArmProber() as prober:
            for cpus in schedule:
                t0 = time.time()
                runs[cpus].append(_run_arm(cpus, corpus_path, warmup_path))
                time.sleep(0.1)  # let >=1 sample land in tiny windows
                arm_health[cpus] += prober.window(t0, time.time())
        lo = min(runs[low], key=lambda r: r["build_sec"])
        hi = min(runs[high], key=lambda r: r["build_sec"])
        med = {
            c: (statistics.median(s) if s else 0.0)
            for c, s in arm_health.items()
        }
        # within-arm reproducibility: see ARM_REPRO_MAX above.
        spread = {
            c: (
                max(r["build_sec"] for r in rs)
                / min(r["build_sec"] for r in rs)
                if len(rs) > 1
                else 1.0
            )
            for c, rs in runs.items()
        }
        reproducible = all(s <= ARM_REPRO_MAX for s in spread.values())
        ok = (
            all(m >= HEALTH_FLOOR_MBPS for m in med.values())
            and reproducible
        )
        accepted += ok
        speedup = lo["build_sec"] / hi["build_sec"]
        row = {
            "pair": i,
            "schedule": ",".join(str(c) for c in schedule),
            "build_sec_runs": {
                str(c): [r["build_sec"] for r in rs] for c, rs in runs.items()
            },
            "low": lo,
            "high": hi,
            "build_speedup": round(speedup, 3),
            "build_scaling_efficiency": round(speedup / (high / low), 3),
            "query_speedup": round(
                lo["query_sec_total"] / hi["query_sec_total"], 3
            ),
            "arm_fault_mbps": {str(c): s for c, s in arm_health.items()},
            "arm_fault_median": {str(c): round(m, 1) for c, m in med.items()},
            "arm_run_spread": {str(c): round(s, 3) for c, s in spread.items()},
            "arm_runs_reproducible": reproducible,
            "healthy": ok,
        }
        pair_rows.append(row)
        print(json.dumps(row), flush=True)

    kept = [r for r in pair_rows if r["healthy"]]
    # headline: median per-pair efficiency over ADMITTED pairs — each ratio
    # is measured inside one window (common-mode noise cancels), the
    # admission gate drops pairs that straddled a degraded window, and the
    # median resists whatever leaks through. Zero admitted pairs => NO
    # headline is claimed (None), never a number from rejected pairs.
    headline_eff = (
        round(
            statistics.median(r["build_scaling_efficiency"] for r in kept), 3
        )
        if kept
        else None
    )
    best_lo = min(r["low"]["build_sec"] for r in kept) if kept else None
    best_hi = min(r["high"]["build_sec"] for r in kept) if kept else None
    n_docs_actual = pair_rows[0]["low"]["n_docs"]
    return {
        "low_cpus": low,
        "high_cpus": high,
        "n_docs": n_docs_actual,
        "health_floor_mbps": HEALTH_FLOOR_MBPS,
        "pairs": pair_rows,
        "pairs_healthy": len(kept),
        "build_sec_low_min": best_lo,
        "build_sec_high_min": best_hi,
        "docs_per_sec_low": round(n_docs_actual / best_lo, 1) if kept else None,
        "docs_per_sec_high": round(n_docs_actual / best_hi, 1) if kept else None,
        "build_scaling_efficiency": headline_eff,
        "pairwise_efficiency_all": [
            r["build_scaling_efficiency"] for r in pair_rows
        ],
        "pairwise_efficiency_admitted": [
            r["build_scaling_efficiency"] for r in kept
        ],
        "hw_cpu_scaling": hw,
        "hw_mem_scaling": hw_mem,
        "job_to_hw_ratio": (
            round(headline_eff / hw["efficiency"], 3) if kept else None
        ),
    }


def orchestrate(
    n_docs: int,
    splits: list[tuple[int, int, int]],
    pairs: int,
    out_path: "str | None" = None,
) -> None:
    # all arms share one JVM; pin its heap once (identical memory per arm
    # — on a real cluster 4N executors get 4x aggregate memory, so equal
    # heaps only flatter the LOW arm: conservative for efficiency)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    corpus_path = _gen_corpus(n_docs)
    warmup_path = _gen_corpus(20000)

    results = [
        run_split(low, high, n_pairs, corpus_path, warmup_path)
        for (low, high, n_pairs) in splits
    ]
    summary = {
        "protocol": (
            "alternating back-to-back pairs, one JVM, tmpfs I/O, warmup "
            "build per arm"
        ),
        "n_docs": results[0]["n_docs"],
        "splits": results,
    }
    print(json.dumps(summary, indent=1))

    os.makedirs("BENCH", exist_ok=True)
    # --out protects the curated records: BENCH/scaling_bench.json holds
    # the criterion pairs and BENCH/BASELINE.md has been hand-extended far
    # beyond the generated template — exploratory runs must clobber neither
    with open(out_path or "BENCH/scaling_bench.json", "w") as f:
        json.dump(summary, f, indent=1)
    if not out_path:
        write_baseline_md(summary)
        print("wrote BENCH/BASELINE.md")


def write_baseline_md(s: dict) -> None:
    def _eff(r: dict) -> str:
        if r["build_scaling_efficiency"] is None:
            return "**inadmissible** (zero pairs pass the repro gate)"
        return f"**{r['build_scaling_efficiency']}**"

    split_rows = "\n".join(
        f"| {r['low_cpus']}→{r['high_cpus']} | "
        f"{r['build_sec_low_min'] if r['build_scaling_efficiency'] is not None else '—'} | "
        f"{r['build_sec_high_min'] if r['build_scaling_efficiency'] is not None else '—'} | "
        f"{r['pairs_healthy']}/{len(r['pairs'])} | "
        f"{_eff(r)} | "
        f"{r['hw_cpu_scaling']['efficiency']} | "
        f"{r.get('hw_mem_scaling', {}).get('stream', {}).get('efficiency', '—')} | "
        f"{r.get('hw_mem_scaling', {}).get('alloc', {}).get('efficiency', '—')} | "
        f"{r['job_to_hw_ratio'] if r['build_scaling_efficiency'] is not None else '—'} |"
        for r in s["splits"]
    )

    def _why_rejected(p: dict) -> str:
        if p["healthy"]:
            return "yes"
        if not p.get("arm_runs_reproducible", True):
            return f"REJECTED (spread > {ARM_REPRO_MAX})"
        return "REJECTED (fault floor)"

    pair_sections = []
    for r in s["splits"]:
        rows = "\n".join(
            f"| {p['pair']} | {p['schedule']} | "
            f"{'/'.join(str(x) for x in p['build_sec_runs'][str(r['low_cpus'])])} | "
            f"{'/'.join(str(x) for x in p['build_sec_runs'][str(r['high_cpus'])])} | "
            f"{p.get('arm_run_spread', {}).get(str(r['low_cpus']), '—')}/"
            f"{p.get('arm_run_spread', {}).get(str(r['high_cpus']), '—')} | "
            f"{p['build_speedup']}x | "
            f"{p['build_scaling_efficiency']} | "
            f"{p['arm_fault_median'][str(r['low_cpus'])]} / "
            f"{p['arm_fault_median'][str(r['high_cpus'])]} | "
            f"{_why_rejected(p)} |"
            for p in r["pairs"]
        )
        title = f"### local[{r['low_cpus']}] vs local[{r['high_cpus']}]"
        if r["build_scaling_efficiency"] is None:
            title += " — NO admitted pairs; raw data retained as context"
        pair_sections.append(
            f"{title}\n\n"
            f"| pair | ABBA schedule | low runs s | high runs s | "
            f"spread (low/high) | speedup | "
            f"efficiency | arm median fault MB/s (low/high) | admitted |\n"
            f"|---|---|---|---|---|---|---|---|---|\n"
            f"{rows}\n"
        )
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — scaling evidence (north rule)

Sandbox stand-in for N vs 4N executors: the SAME index-build + BM25 query
job on the SAME synthetic webtext input ({s['n_docs']} docs, seed 123) at
local[N] vs local[4N], at several N.

**Reading the numbers:** the VM advertises 32 vCPUs but delivers ~16
physical cores x 2 SMT threads — a pure-CPU multiprocessing probe (no
Spark, cache-resident work) measures the HARDWARE's own N→4N scaling at
each split (column "hw ceiling"); no job can exceed it, and splits whose
4N arm crosses the physical-core budget measure hyperthread contention,
not the job. On a real cluster, going N→4N *executors* adds physical
cores — the small-N splits are the faithful analog. The last column is
the job's efficiency as a fraction of what the hardware gives.

**Why paired runs:** host first-touch page-fault throughput swings >100x
on a minutes timescale (committed probes: 6 MB/s to 5.9 GB/s), so each
pair runs both arms back-to-back in one process/JVM (context restart
only) with a small warmup build per arm (JIT + Python-worker spawn +
first-touch costs leave the measurement), and arm order alternates — the
per-pair ratio cancels the common-mode host noise that made absolute
cross-window times incomparable.

**Why tmpfs I/O:** on a real cluster each executor shuffles to its own
disks and writes to distributed storage (per-executor bandwidth scales
with N); local mode's single OS disk does not, so RAM-backed shuffle +
index output isolate the CPU-scaling signal the criterion is about.

**Admission gate:** a daemon thread samples first-touch throughput every
~8s WHILE each arm runs (boundary probes miss mid-arm window collapses —
the round-2 lesson); a pair is admitted only when BOTH arms' in-flight
median clears {HEALTH_FLOOR_MBPS:.0f} MB/s, and pairs accrue until the
target number pass. Rejected pairs stay in the table, flagged. The
headline per split is the MEDIAN per-pair efficiency over admitted pairs.

**ABBA within each pair:** each arm runs twice per pair (A,B,B,A; the
leading arm alternates across pairs) and is scored by its faster run —
measured runs showed a ~20-40% advantage for whichever arm ran second in
a simple A,B pair, in BOTH orders and even after the shared JVM had seen
multiple full builds; ABBA-min gives both arms a late-position run in the
same host window, cancelling that effect whatever its cause.

**Memory ceilings (hw mem columns):** the pure-CPU ceiling is cache-resident
on purpose; a Spark build also pays DRAM. Two no-Spark probes at each split
measure the box's aggregate memory throughput scaling: *stream* (warm-page
read+write — sort/shuffle/scan regime) and *alloc* (fresh-page first-touch —
agg/object-churn regime). On this VM alloc throughput COLLAPSES with
concurrency (more threads, fewer total MB/s) — any allocation-heavy stage is
bounded by that curve here, while real N→4N EXECUTORS multiply memory
controllers and page-fault paths with the cores.

| split N→4N | N build s (min) | 4N build s (min) | pairs healthy | job efficiency | hw cpu ceiling | hw mem stream | hw mem alloc | job/hw-cpu |
|---|---|---|---|---|---|---|---|---|
{split_rows}

{chr(10).join(pair_sections)}
Reference single-node baseline (BASELINE.md): 7,880 docs/sec parse+segment
phase on a 47M-doc corpus, 0.92-1.26 s/query BM25.
"""
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500000)
    ap.add_argument(
        "--splits",
        default="1:4:3,2:8:2,4:16:2",
        help="comma-separated low:high[:healthy-pairs] core splits",
    )
    ap.add_argument("--pairs", type=int, default=2, help="default per split")
    ap.add_argument(
        "--out",
        default=None,
        help="output JSON path (exploratory runs; also skips BASELINE.md)",
    )
    args = ap.parse_args()
    split_list = []
    for x in args.splits.split(","):
        parts = [int(v) for v in x.split(":")]
        split_list.append(
            (parts[0], parts[1], parts[2] if len(parts) > 2 else args.pairs)
        )
    orchestrate(args.docs, split_list, args.pairs, args.out)

"""N vs 4N EXECUTOR scaling on a Spark standalone cluster (north-rule evidence).

Unlike `tools/scaling_bench.py` (local[N] vs local[4N] in ONE JVM — where a
single GC domain and one shuffle service understate real-cluster scaling),
this bench runs the same index-build + BM25 job against a standalone cluster
of 4 worker JVMs × 4 cores on this box, capping ``spark.cores.max`` at 4
(→ 1 executor, N) and 16 (→ 4 executors, 4N). Each executor is its own JVM
with its own memory manager and (tmpfs) shuffle dirs — the per-executor
resource model the rule's criterion assumes. The engine package ships to
executors as a zip via spark.submit.pyFiles (the spark-submit --py-files
mechanism).

4 cores per worker on purpose: the box's 32 vCPUs are ~16 physical cores × 2
SMT threads (measured — `tools/scaling_bench.py hw_cpu_scaling`), so 4×4c=16
threads is the largest 4N arm that still adds PHYSICAL cores, which is what
adding executors does on a real cluster. The round-2 run used 4×8c=32 threads
and measured hyperthread contention, not executor scaling.

Protocol matches scaling_bench.py: the two arms run as back-to-back PAIRS
from one driver process (new SparkSession per arm against the same cluster),
arm order alternating, a small warmup build per arm (executor JIT + Python
worker spawn leave the measurement). An in-flight prober samples host
first-touch throughput WHILE each arm runs, and a pair is only admitted
when both arms' median sample clears the health floor — pairs accrue until
the target number pass (round-2 ran entirely inside a degraded host window
and measured the window, not the job).

Cluster setup (idempotent, run once per boot):
  tools/start_cluster.sh      # master on 127.0.0.1:7077 + 4 workers 4c/16g

Usage:
  python tools/cluster_scaling_bench.py [--docs 500000] [--pairs 3]
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
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_bench import (
    ARM_REPRO_MAX,
    HEALTH_FLOOR_MBPS,
    QUERIES,
    _ArmProber,
    _gen_corpus,
)

MASTER = os.environ.get("SPARK_STANDALONE_MASTER", "spark://127.0.0.1:7077")
# Executor size is a measurement choice on this box, not a tuning knob:
# 4-core executors make the 4N arm 16 threads, which on this single host is
# DRAM-bandwidth-saturated (ARCHITECTURE.md §8 — the postings stage measures
# ~0.27 efficiency 4→16 THREADS regardless of how they are grouped into
# JVMs, because 4 executor JVMs share one memory subsystem; a real cluster
# multiplies memory channels with executors). 1-core executors keep the 4N
# arm (4 threads total) inside the box's bandwidth envelope, so the 1→4
# EXECUTOR split measures executor scaling (per-executor JVM, shuffle over
# localhost TCP, independent Python worker pools) rather than the host's
# memory ceiling. Start the cluster with matching CORES_PER_WORKER.
CORES_PER_EXECUTOR = int(os.environ.get("CLUSTER_CORES_PER_EXECUTOR", "4"))


def _package_zip() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = "search_engine_trec_fair_ranking_19_spark"
    out = os.path.join(tempfile.gettempdir(), "engine_pkg.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(os.path.join(root, pkg)):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


def cluster_session(cores_max: int, app_name: str, extra_conf: dict | None = None):
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    # tmpfs — vanishes on VM restart; the accumulator UDS bind fails with a
    # bare FileNotFoundError if the socket dir is missing.
    os.makedirs("/dev/shm/pyuds", exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(app_name)
        .master(MASTER)
        .config("spark.cores.max", str(cores_max))
        .config("spark.executor.cores", str(CORES_PER_EXECUTOR))
        .config("spark.executor.memory", "12g")
        .config("spark.driver.memory", "12g")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.submit.pyFiles", _package_zip())
        .config("spark.sql.shuffle.partitions", str(max(cores_max * 2, 16)))
        # single-host homogeneous cluster: waiting for PROCESS_LOCAL slots on
        # the executor that happens to hold a cached/shuffle block is pure
        # loss (default 3s/task wave). Measured at 2M docs: the 4-executor
        # arm ran 2x SLOWER than 1 executor with waits on — every stage over
        # the cached token frame serialized behind locality stalls.
        .config("spark.locality.wait", "0s")
        # hang insurance, observed in the wild on this VM: the executor<->
        # Python-worker Arrow socket can wedge at the KERNEL level (both
        # directions' send queues full, zero CPU, no data movement for 25+
        # min — loopback TCP stall, not a code deadlock; jstack shows the
        # JVM in ReaderInputStream epoll, /proc/<worker>/stack shows the
        # worker in sk_stream_wait_memory). Speculation re-runs the straggler
        # on another executor and kills the wedged attempt. Only effective
        # when a free slot exists (the multi-executor arm); a measured run
        # costs at most one duplicated tail task, a wedge costs the bench.
        .config("spark.speculation", "true")
        .config("spark.speculation.multiplier", "4")
        .config("spark.speculation.quantile", "0.75")
        # ...and prevention: route the executor<->worker Arrow stream over
        # AF_UNIX instead of loopback TCP. The wedge above was a TCP
        # flow-control stall (both peers blocked while both queues were
        # full); unix sockets have no window/ACK machinery to stall. Shorter
        # sub-minute stalls from the same cause also inflated whole arms
        # (a 1M-doc 4-executor build measured 686s vs ~160s expected).
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.python.unix.domain.socket.dir", "/dev/shm/pyuds")
        # Loopback-tuned shuffle transport (tools/cluster_tax_probe.py,
        # measured 1.098x on the 4-exec arm in an admissible pair): with
        # shuffle files on tmpfs and fetches over 127.0.0.1, LZ4
        # encode/decode is pure CPU with no bandwidth to save, and
        # fetch-window/buffer sizes tuned for real networks only throttle.
        # On a real multi-host cluster keep compression ON - this conf is
        # per-topology, chosen for the measured loopback cluster.
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.reducer.maxSizeInFlight", "256m")
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for _k, _v in (extra_conf or {}).items():
        spark = spark.config(_k, _v)
    spark = spark.getOrCreate()
    # spark.submit.pyFiles is only processed when THIS session launches the
    # JVM; if an earlier local session (e.g. corpus generation) already
    # started the gateway, the conf is silently ignored and executors fail
    # with ModuleNotFoundError. addPyFile ships the zip at runtime either way.
    spark.sparkContext.addPyFile(_package_zip())
    return spark


def _run_arm(cores_max: int, corpus_path: str, warmup_path: str, extra_conf: dict | None = None) -> dict:
    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators import query as q
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )

    spark = cluster_session(cores_max, f"cluster-scaling-{cores_max}", extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        cfg = EngineConfig()
        wdir = tempfile.mkdtemp(prefix=f"cluster_warm_{cores_max}_", dir="/dev/shm")
        try:
            build_index(spark, spark.read.parquet(warmup_path), wdir, cfg)
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

        webtext = spark.read.parquet(corpus_path)
        n_docs = webtext.count()
        index_dir = tempfile.mkdtemp(
            prefix=f"cluster_idx_{cores_max}_", dir="/dev/shm"
        )
        try:
            t0 = time.time()
            tables = build_index(spark, webtext, index_dir, cfg)
            build_sec = time.time() - t0
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
            "n_docs": n_docs,
            "build_sec": round(build_sec, 3),
            "docs_per_sec": round(n_docs / build_sec, 1),
            "query_sec_total": round(query_sec, 3),
        }
    finally:
        spark.stop()


# The box's memory subsystem has WINDOWS like its page-fault path does:
# measured same-day extremes of 1→4-worker stream-scaling efficiency are
# 0.55 (absolute 115 MB/s/worker) to ~0.9+. The build's dominant stage is
# stream-bound (ARCHITECTURE.md §8), so a pair measured in a collapsed
# window reports the window, not the job — a fault-throughput floor alone
# does not catch this (fault medians of 90+ GB/s coexisted with 0.55
# stream scaling). Probe the hardware's own 1→4 scaling at each pair
# boundary and require headroom before admitting the pair.
HW_STREAM_EFF_FLOOR = 0.70
# max allowed ratio between the two arms' in-flight fault medians — arms
# measured in dissimilar host windows compare hosts, not topologies
ARM_SYMMETRY_MAX = 4.0
# max allowed max/min ratio between an arm's own two ABBA runs — the runs
# are IDENTICAL work, so any spread beyond warmup jitter means the host
# window shifted mid-pair and the min-of-runs no longer samples a common
# window for both arms (observed: 131s vs 392s for the same 4-executor
# build inside one "healthy-by-fault-median" pair). Outcome-blind: it
# judges run stability, not efficiency. The bound itself (ARM_REPRO_MAX)
# is defined once in tools/scaling_bench.py (calibration rationale there)
# and imported above so the two bench tools cannot drift.


def _hw_window() -> dict:
    # stream scaling is the admission signal (the build's dominant stage is
    # stream-bound); the box's pure-CPU 1→4 scaling measured a stable ~0.99
    # across windows, so it is not re-probed per pair (a full hw_cpu_scaling
    # is ~2-3 min of the pair budget for a constant)
    from tools.scaling_bench import hw_mem_scaling

    mem = hw_mem_scaling(1, 4)
    return {
        "stream_eff_1_4": mem["stream"]["efficiency"],
        "stream_mbps_1": mem["stream"]["low_mbps"],
        "alloc_eff_1_4": mem["alloc"]["efficiency"],
    }


def orchestrate(n_docs: int, pairs: int, out_path: "str | None" = None) -> None:
    corpus_path = _gen_corpus(n_docs)
    warmup_path = _gen_corpus(20000)
    low, high = CORES_PER_EXECUTOR, CORES_PER_EXECUTOR * 4

    pair_rows = []
    accepted = 0
    for i in range(pairs * 3):
        if accepted >= pairs:
            break
        hw = _hw_window()
        a, b = (low, high) if i % 2 == 0 else (high, low)
        schedule = (a, b, b, a)  # ABBA-min: see tools/scaling_bench.py
        runs: dict[int, list[dict]] = {low: [], high: []}
        arm_health: dict[int, list[float]] = {low: [], high: []}
        with _ArmProber() as prober:
            for cores in schedule:
                t0 = time.time()
                runs[cores].append(_run_arm(cores, corpus_path, warmup_path))
                time.sleep(0.1)
                arm_health[cores] += prober.window(t0, time.time())
        lo = min(runs[low], key=lambda r: r["build_sec"])
        hi = min(runs[high], key=lambda r: r["build_sec"])
        med = {
            c: (statistics.median(s) if s else 0.0)
            for c, s in arm_health.items()
        }
        hw_ok = hw["stream_eff_1_4"] >= HW_STREAM_EFF_FLOOR
        # both arms must also see COMPARABLE windows: a measured pair where
        # one arm ran at 95 GB/s fault throughput and the other at 6.8 GB/s
        # passed the absolute floor yet compared two different hosts — the
        # ratio such a pair produces is window skew, not job scaling
        meds = list(med.values())
        symmetric = max(meds) <= ARM_SYMMETRY_MAX * max(min(meds), 1e-9)
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
            and hw_ok
            and symmetric
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
            "build_scaling_efficiency": round(speedup / 4, 3),
            "query_speedup": round(
                lo["query_sec_total"] / hi["query_sec_total"], 3
            ),
            "arm_fault_mbps": {str(c): s for c, s in arm_health.items()},
            "arm_fault_median": {str(c): round(m, 1) for c, m in med.items()},
            "hw_window": hw,
            "hw_scaling_ok": hw_ok,
            "arm_windows_symmetric": symmetric,
            "arm_run_spread": {str(c): round(s, 3) for c, s in spread.items()},
            "arm_runs_reproducible": reproducible,
            "healthy": ok,
        }
        pair_rows.append(row)
        print(json.dumps(row), flush=True)

    kept = [r for r in pair_rows if r["healthy"]] or pair_rows
    best_lo = min(r["low"]["build_sec"] for r in kept)
    best_hi = min(r["high"]["build_sec"] for r in kept)
    pair_effs = [r["build_scaling_efficiency"] for r in kept]
    n_actual = pair_rows[0]["low"]["n_docs"]
    summary = {
        "mode": (
            f"standalone-cluster 1 vs 4 executors "
            f"({CORES_PER_EXECUTOR} cores each), paired protocol, in-flight "
            f"health admission gate, warmup build per arm"
        ),
        "cores_per_executor": CORES_PER_EXECUTOR,
        "n_docs": n_actual,
        "health_floor_mbps": HEALTH_FLOOR_MBPS,
        "pairs": pair_rows,
        "pairs_healthy": len([r for r in pair_rows if r["healthy"]]),
        "build_sec_low_min": best_lo,
        "build_sec_high_min": best_hi,
        "docs_per_sec_low": round(n_actual / best_lo, 1),
        "docs_per_sec_high": round(n_actual / best_hi, 1),
        "build_scaling_efficiency": round(statistics.median(pair_effs), 3),
        "pairwise_efficiency_all": pair_effs,
    }
    print(json.dumps(summary, indent=1))
    os.makedirs("BENCH", exist_ok=True)
    suffix = "" if CORES_PER_EXECUTOR == 4 else f"_{CORES_PER_EXECUTOR}c"
    # --out protects curated records (e.g. the 500k headline) from being
    # clobbered by exploratory runs at other scales
    with open(out_path or f"BENCH/cluster_scaling{suffix}.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--out", default=None, help="output JSON path")
    args = ap.parse_args()
    orchestrate(args.docs, args.pairs, args.out)

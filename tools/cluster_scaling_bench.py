"""N vs 4N EXECUTOR scaling on a Spark standalone cluster (north-rule evidence).

Unlike `tools/scaling_bench.py` (local[8] vs local[32] in ONE JVM — where a
single 32-thread GC domain and one shuffle service understate real-cluster
scaling), this bench runs the same index-build + BM25 job against a standalone
cluster of 4 worker JVMs × 8 cores on this box, capping `spark.cores.max` at
8 (→ 1 executor, N) and 32 (→ 4 executors, 4N). Each executor is its own JVM
with its own memory manager and (tmpfs) shuffle dirs — the per-executor
resource model the rule's criterion assumes. The engine package ships to
executors as a zip via spark.submit.pyFiles (the spark-submit --py-files
mechanism).

Cluster setup (idempotent, run once per boot):
  tools/start_cluster.sh      # master on 127.0.0.1:7077 + 4 workers 8c/20g

Usage:
  SCALING_TRIALS=3 python tools/cluster_scaling_bench.py [--docs 2000000]
  python tools/cluster_scaling_bench.py --run-one 8 <corpus> <out.json>
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MASTER = os.environ.get("SPARK_STANDALONE_MASTER", "spark://127.0.0.1:7077")
QUERIES = [
    "web search engine rank",
    "w00001 w00002 spark",
    "index partition shuffle",
    "running quickly computing",
]


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


def cluster_session(cores_max: int, app_name: str):
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app_name)
        .master(MASTER)
        .config("spark.cores.max", str(cores_max))
        .config("spark.executor.cores", "8")
        .config("spark.executor.memory", "16g")
        .config("spark.driver.memory", "12g")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.submit.pyFiles", _package_zip())
        .config("spark.sql.shuffle.partitions", str(max(cores_max * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.files.minPartitionNum", str(cores_max * 3))
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def run_one(cores_max: int, corpus_path: str, out_path: str) -> None:
    import shutil

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.scaling_bench import host_fault_mbps

    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators import query as q
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )

    spark = cluster_session(cores_max, f"cluster-scaling-{cores_max}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()
    webtext = spark.read.parquet(corpus_path)
    n_docs = webtext.count()

    trials = int(os.environ.get("SCALING_TRIALS", "3"))
    build_secs, query_secs, fault_mbps = [], [], []
    for _ in range(trials):
        fault_mbps.append(host_fault_mbps())
        index_dir = tempfile.mkdtemp(prefix=f"cluster_idx_{cores_max}_")
        try:
            t0 = time.time()
            tables = build_index(spark, webtext, index_dir, cfg)
            build_secs.append(time.time() - t0)

            q.bm25_topk(spark, tables, "warm up", k=10)
            t0 = time.time()
            for text in QUERIES:
                q.bm25_topk(spark, tables, text, k=20).collect()
            query_secs.append(time.time() - t0)
        finally:
            shutil.rmtree(index_dir, ignore_errors=True)

    build_sec, query_sec = min(build_secs), min(query_secs)
    with open(out_path, "w") as f:
        json.dump(
            {
                "executors": cores_max // 8,
                "cores_max": cores_max,
                "n_docs": n_docs,
                "build_sec": round(build_sec, 3),
                "build_sec_trials": [round(s, 3) for s in build_secs],
                "docs_per_sec": round(n_docs / build_sec, 1),
                "query_sec_total": round(query_sec, 3),
                "query_sec_trials": [round(s, 3) for s in query_secs],
                "query_sec_avg": round(query_sec / len(QUERIES), 3),
                "host_fault_mbps_trials": fault_mbps,
            },
            f,
        )
    spark.stop()


def orchestrate(n_docs: int) -> None:
    corpus_path = os.path.join(
        tempfile.gettempdir(), f"scaling_corpus_{n_docs}.parquet"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        from search_engine_trec_fair_ranking_19_spark.sources.webtext import (
            corpus_spark_distributed,
        )

        spark = cluster_session(32, "cluster-gen")
        corpus_spark_distributed(spark, n_docs, seed=123).write.mode(
            "overwrite"
        ).parquet(corpus_path)
        spark.stop()

    results = {}
    for cores in (8, 32):
        out = os.path.join(tempfile.gettempdir(), f"cluster_scaling_{cores}.json")
        subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--run-one",
                str(cores),
                corpus_path,
                out,
            ],
            check=True,
        )
        with open(out) as f:
            results[cores] = json.load(f)
    write_summary(results[8], results[32])


def write_summary(lo: dict, hi: dict) -> None:
    speedup = lo["build_sec"] / hi["build_sec"]
    efficiency = speedup / (hi["cores_max"] / lo["cores_max"])
    q_speedup = lo["query_sec_total"] / hi["query_sec_total"]
    summary = {
        "mode": "standalone-cluster 1 vs 4 executors (8 cores each)",
        "n_docs": lo["n_docs"],
        "low": lo,
        "high": hi,
        "build_speedup": round(speedup, 3),
        "build_scaling_efficiency": round(efficiency, 3),
        "query_speedup": round(q_speedup, 3),
    }
    print(json.dumps(summary, indent=1))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cluster_scaling.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-one", nargs=3, metavar=("CORES", "CORPUS", "OUT"))
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--summarize", action="store_true")
    args = ap.parse_args()
    if args.run_one:
        run_one(int(args.run_one[0]), args.run_one[1], args.run_one[2])
    elif args.summarize:
        with open("/tmp/cluster_scaling_8.json") as f:
            lo = json.load(f)
        with open("/tmp/cluster_scaling_32.json") as f:
            hi = json.load(f)
        write_summary(lo, hi)
    else:
        orchestrate(args.docs)

"""Single-query BM25 top-k latency at a 1M-doc corpus — the reference's
headline regime, measured per query class and per parallelism arm.

The reference's per-query numbers (0.92-1.26 s/query BM25, BASELINE.md) are
SINGLE-THREADED on its 47M-doc index; every committed per-query number here
so far is either sf0.1 (5k docs — driver-round-trip-bound) or the 500k
evaluation loop. This tool measures the routed production query path
(`bm25_topk_wand`: driver-arithmetic routing, exhaustive fallback —
rank-identical either way) at 1M docs, in two arms:

  * local[1]  — the reference's execution shape (one thread end to end);
  * local[32] — the box's parallel shape (what a per-executor slice of a
    real cluster sees).

Query classes probe the latency distribution a real query log spans on a
Zipf vocabulary (`sources/webtext.py:_vocab`): `head` = 3 top-rank terms
(largest posting decode volume), `mixed` = 1 head + 2 mid-tail, `tail` = 3
deep-tail terms (selective — tiny decode). Per-query wall includes plan
build, decode, score, top-k, and collect — the user-visible number.

Protocol: the same admission machinery as every bench here (in-flight
host-fault prober, two full passes per arm, within-arm spread gate
ARM_REPRO_MAX on pass totals, attempts until a window admits). Per-query
time is the min over the two passes (position-in-pass effects cancel; the
pass TOTALS carry the reproducibility gate).

Writes BENCH/query_latency_1m.json.

Usage: python tools/query_latency_at_scale.py [--docs 1000000] [--k 50]
                                              [--attempts 4]
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

# 4 queries per class; terms from sources/webtext.py:_vocab (= _COMMON head
# words + w00000..w19999 Zipf tail). Head words are the top Zipf ranks —
# the expensive decode regime; deep-tail terms are the selective regime.
QUERY_CLASSES: dict[str, list[str]] = {
    "head": [
        "web page search",
        "spark shuffle partition",
        "query index data",
        "search web query",
    ],
    "mixed": [
        "web w00120 w00340",
        "query w00210 w00455",
        "index w00075 w00510",
        "page w00160 w00390",
    ],
    "tail": [
        "w15012 w17344 w19001",
        "w14230 w16788 w18455",
        "w13109 w15677 w19772",
        "w12545 w16023 w18310",
    ],
}


def _flat_queries() -> list[tuple[str, str]]:
    return [(cls, q) for cls, qs in QUERY_CLASSES.items() for q in qs]


def _run_arm(
    master: str, corpus_path: str, index_dir: str, k: int, attempts: int
) -> dict:
    """One parallelism arm: fresh session, warmup, two timed passes over the
    full query suite, admission-gated; retried up to `attempts` windows."""
    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )
    from search_engine_trec_fair_ranking_19_spark.operators.query import (
        bm25_topk_wand,
    )
    from search_engine_trec_fair_ranking_19_spark.session import get_spark

    queries = _flat_queries()
    tried = []
    for _ in range(attempts):
        spark = get_spark(
            app_name=f"qlat-{master}",
            master=master,
            extra_conf=(
                {"spark.local.dir": "/dev/shm/spark-local"}
                if os.path.isdir("/dev/shm")
                else None
            ),
        )
        try:
            # resume=True on a complete manifest: every stage is skipped;
            # the corpus frame is only consulted for a url-count sanity
            # check (one column scan), so the arm pays no build work
            tables = build_index(
                spark,
                spark.read.parquet(corpus_path),
                index_dir,
                EngineConfig(),
                resume=True,
            )
            # warmup: JIT + postings/doc_stats cache load leave the timing
            for _, q in (queries[0], queries[-1]):
                bm25_topk_wand(spark, tables, q, k=k).collect()

            def one_pass() -> tuple[list[float], list[str]]:
                secs, routes = [], []
                for _, q in queries:
                    st: dict = {}
                    t0 = time.time()
                    bm25_topk_wand(spark, tables, q, k=k, stats=st).collect()
                    secs.append(round(time.time() - t0, 3))
                    routes.append(st.get("fallback", "wand"))
                return secs, routes

            with _ArmProber(interval=4.0) as prober:
                t0 = time.time()
                p1, routes = one_pass()
                p2, _ = one_pass()
                t1 = time.time()
            window = prober.window(t0, t1)
            probe_med = statistics.median(window) if window else 0.0
            tot1, tot2 = sum(p1), sum(p2)
            spread = round(max(tot1, tot2) / max(min(tot1, tot2), 1e-9), 3)
            admissible = (
                probe_med >= HEALTH_FLOOR_MBPS and spread <= ARM_REPRO_MAX
            )
            per_query = [min(a, b) for a, b in zip(p1, p2)]
            ordered = sorted(per_query)
            by_class = {
                cls: round(
                    statistics.mean(
                        s
                        for (c, _), s in zip(queries, per_query)
                        if c == cls
                    ),
                    3,
                )
                for cls in QUERY_CLASSES
            }
            tried.append(
                {
                    "master": master,
                    "pass_totals_sec": [round(tot1, 3), round(tot2, 3)],
                    "spread": spread,
                    "probe_mbps_median": round(probe_med, 1),
                    "admissible": admissible,
                    "p50_sec": ordered[len(ordered) // 2],
                    "p90_sec": ordered[int(len(ordered) * 0.9)],
                    "mean_sec": round(statistics.mean(per_query), 3),
                    "by_class_mean_sec": by_class,
                    "per_query_sec": dict(
                        zip([q for _, q in queries], per_query)
                    ),
                    "routes": dict(zip([q for _, q in queries], routes)),
                }
            )
        finally:
            spark.stop()
        print(json.dumps(tried[-1]), flush=True)
        if tried[-1]["admissible"]:
            break
    return max(tried, key=lambda a: (a["admissible"], a["probe_mbps_median"]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--attempts", type=int, default=4)
    args = ap.parse_args()

    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )
    from search_engine_trec_fair_ranking_19_spark.session import get_spark

    corpus_path = _gen_corpus(args.docs)
    index_dir = os.path.join(tempfile.gettempdir(), f"qlat_idx_{args.docs}")

    # build once at full parallelism (resume-aware: a prior run's index on
    # the same corpus is reused stage by stage)
    spark = get_spark(
        app_name="qlat-build",
        master="local[32]",
        extra_conf=(
            {"spark.local.dir": "/dev/shm/spark-local"}
            if os.path.isdir("/dev/shm")
            else None
        ),
    )
    t0 = time.time()
    build_index(
        spark,
        spark.read.parquet(corpus_path),
        index_dir,
        EngineConfig(),
        resume=True,
    )
    build_sec = round(time.time() - t0, 1)
    spark.stop()
    print(f"index ready in {build_sec}s", flush=True)

    arms = {
        m: _run_arm(m, corpus_path, index_dir, args.k, args.attempts)
        for m in ("local[1]", "local[32]")
    }
    out = {
        "n_docs": args.docs,
        "k": args.k,
        "n_queries": len(_flat_queries()),
        "query_classes": {c: len(qs) for c, qs in QUERY_CLASSES.items()},
        "arms": arms,
        "reference_sec_per_query": (
            "0.92-1.26 BM25 avg (47M docs, single thread; BASELINE.md)"
        ),
        "admission_params": {
            "health_floor_mbps": HEALTH_FLOOR_MBPS,
            "arm_repro_max": ARM_REPRO_MAX,
        },
    }
    print(json.dumps(out, indent=1))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/query_latency_1m.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

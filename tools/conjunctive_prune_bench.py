"""Measure conjunctive block-intersection pruning vs the exhaustive AND.

The pruned path (query.conjunctive, CONJ_PRUNE_MAX_BLOCKS route) collects
the rarest term's block ids with one tiny metadata job and restricts the
shared postings scan to them; the exhaustive path decodes every posting of
every query term. The win regime is the same as WAND's: a selective
(hapax-tail) term AND head terms — the head terms' decode shrinks from
their full DF to the few blocks containing the rare term. All-common ANDs
are the negative control: min DF exceeds the route bound, the router keeps
them exhaustive, and forcing the pruned path there would collect a huge
block list for no decode saving.

Reuses the hapax-enriched corpus/index of tools/wand_crossover_bench.py
(cached under /tmp) and its measurement discipline: min-of-N trials, the
instrumented run (block counts) kept outside the timed runs, and result
parity asserted between the two paths on every query.

Usage: python tools/conjunctive_prune_bench.py [--docs 2000000] [--trials 2]
Writes BENCH/conjunctive_prune.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--out", default="BENCH/conjunctive_prune.json")
    args = ap.parse_args()

    from search_engine_trec_fair_ranking_19_spark.config import EngineConfig
    from search_engine_trec_fair_ranking_19_spark.operators import query as qq
    from search_engine_trec_fair_ranking_19_spark.operators.index_build import (
        build_index,
    )
    from search_engine_trec_fair_ranking_19_spark.session import get_spark
    from search_engine_trec_fair_ranking_19_spark.sources.webtext import (
        corpus_spark_distributed,
    )

    spark = get_spark(
        app_name="conjunctive-prune",
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
        corpus_spark_distributed(
            spark, n_docs, seed=123, hapax=True
        ).write.mode("overwrite").parquet(corpus_path)
    index_dir = os.path.join(tempfile.gettempdir(), f"wand_hapax_idx_{n_docs}")
    cfg = EngineConfig()
    tables = build_index(
        spark, spark.read.parquet(corpus_path), index_dir, cfg, resume=True
    )
    qq.bm25_topk(spark, tables, "warm up", k=10)  # worker warm-up

    step = max(n_docs // 13, 1)
    rare = [f"hxq{i * step}a" for i in (1, 5, 9)]
    queries = [
        # selective: one hapax term AND two head terms
        f"{rare[0]} web search",
        f"{rare[1]} index data",
        f"{rare[2]} engine text",
        # three hapax terms (empty intersection is likely — still must scan)
        " ".join(rare),
        # negative control: all-common AND, router must stay exhaustive
        "web search data",
    ]

    per_query = []
    for text in queries:
        pruned_t, ex_t = [], []
        stats: dict = {}
        rows_pruned = {
            r["docid"]
            for r in qq.conjunctive(
                spark, tables, text, k=None, stats=stats
            ).collect()
        }
        old = qq.CONJ_PRUNE_MAX_BLOCKS
        try:
            qq.CONJ_PRUNE_MAX_BLOCKS = -1
            rows_ex = {
                r["docid"]
                for r in qq.conjunctive(spark, tables, text, k=None).collect()
            }
            assert rows_pruned == rows_ex, (text, len(rows_pruned), len(rows_ex))
            for _ in range(args.trials):
                t0 = time.time()
                qq.conjunctive(spark, tables, text, k=None).collect()
                ex_t.append(time.time() - t0)
        finally:
            qq.CONJ_PRUNE_MAX_BLOCKS = old
        for _ in range(args.trials):
            t0 = time.time()
            qq.conjunctive(spark, tables, text, k=None).collect()
            pruned_t.append(time.time() - t0)
        pq = qq.prepare_query(spark, tables, text, cfg)
        per_query.append(
            {
                "query": text,
                "sum_df": int(sum(pq.dfs)),
                "min_df": int(min(pq.dfs)),
                "route": stats.get("conjunctive"),
                "n_candidate_blocks": stats.get("n_candidate_blocks"),
                "n_matches": len(rows_pruned),
                "routed_sec": round(min(pruned_t), 3),
                "exhaustive_sec": round(min(ex_t), 3),
                "pruning_wins": min(pruned_t) < min(ex_t),
            }
        )
        print(json.dumps(per_query[-1]), flush=True)

    out = {
        "n_docs": n_docs,
        "trials_per_arm": args.trials,
        "queries": per_query,
        "note": (
            "routed_sec = production router (block pruning when rarest "
            "DF <= CONJ_PRUNE_MAX_BLOCKS); exhaustive_sec = forced full "
            "decode. Result parity asserted per query before timing."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

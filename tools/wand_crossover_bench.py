"""Measure the WAND-vs-exhaustive crossover to justify `wand_min_postings`.

Block-max WAND pays a metadata pass + seed-and-prune jobs before decoding;
that only pays off once the candidate posting volume (Σ DF over query terms)
is large enough that the avoided decode+score work exceeds the extra job
overhead. This bench builds indexes over growing synthetic corpora, runs the
same queries through the forced-WAND path (`wand_min_postings=0`) and the
exhaustive path, and reports per-size p50s plus each query's Σ DF — the
`EngineConfig.wand_min_postings` default is picked from the smallest Σ DF
where WAND wins.

Usage: python tools/wand_crossover_bench.py [--sizes 125000 500000 2000000]
Writes BENCH/wand_crossover.json.
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

# Three query classes:
#   * all-common-term queries — every block's upper bound stays above the
#     top-k threshold, pruning CANNOT pay, the router must send them
#     exhaustive;
#   * single-hapax selective queries — one df=1 term + common terms. With
#     k=10 the seed threshold θ is the k-TH best score, and a df=1 term can
#     lift only ONE doc above the common-doc score floor, so θ stays at
#     common-doc level and no block prunes (measured round 2: 0 blocks
#     pruned on every such query). Kept as the negative control.
#   * rare-SET selective queries (`rare_set_queries`) — ≥k rare terms (df
#     small but Σ matched docs ≥ k) + common terms: the whole top-k is
#     rare-doc, θ rises above every common-only block's UB, and blocks
#     lacking a rare term prune. This is the real-webtext regime (a
#     selective phrase/entity term with df in [k, ~1000]) that the closed
#     Zipf vocabulary lacks and the hapax tail restores.
QUERIES = [
    "web search engine rank",
    "index partition shuffle data",
    "running quickly computing",
    "crawl text token corpus",
    "w00931 web search",
    "w01477 index data",
    "w00764 w01891 rank",
    "hxq12345a web search rank",
    "hxq777a index data engine",
    "hxq4242b crawl text",
]


def rare_set_queries(n_docs: int) -> list[str]:
    """Selective queries whose rare-term SET covers ≥ k docs: 12 hapax
    tokens spread evenly over the docid space (each lands in a different
    posting-block group) + common terms that make the exhaustive plan
    expensive. Block-max pruning keeps only the ~12 groups containing a
    rare doc."""
    step = max(n_docs // 13, 1)
    ids = [i * step for i in range(1, 13)]
    rare = " ".join(f"hxq{i}a" for i in ids)
    return [
        f"{rare} web search data",
        f"{rare} index engine text",
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[500000])
    ap.add_argument("--trials", type=int, default=2)
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
        app_name="wand-crossover",
        extra_conf=(
            {"spark.local.dir": "/dev/shm/spark-local"}
            if os.path.isdir("/dev/shm")
            else None
        ),
    )
    results = []
    for n_docs in args.sizes:
        # hapax-enriched corpus: the closed Zipf vocabulary has no
        # block-rare terms (min df >= number of blocks), which makes
        # block-max pruning structurally unable to pay; real web text's
        # hapax tail is the regime it exists for
        corpus_path = os.path.join(
            tempfile.gettempdir(), f"scaling_corpus_hapax_{n_docs}.parquet"
        )
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            corpus_spark_distributed(
                spark, n_docs, seed=123, hapax=True
            ).write.mode("overwrite").parquet(corpus_path)
        index_dir = os.path.join(
            tempfile.gettempdir(), f"wand_hapax_idx_{n_docs}"
        )
        cfg = EngineConfig()
        tables = build_index(
            spark, spark.read.parquet(corpus_path), index_dir, cfg, resume=True
        )
        forced = cfg.with_(wand_min_postings=0)
        q.bm25_topk(spark, tables, "warm up", k=10)  # worker warm-up

        per_query = []
        for text in QUERIES + rare_set_queries(n_docs):
            pq = q.prepare_query(spark, tables, text, cfg)
            sum_df = int(sum(pq.dfs))
            ex_t, wd_t = [], []
            for _ in range(args.trials):
                t0 = time.time()
                q.bm25_topk(spark, tables, text, k=10).collect()
                ex_t.append(time.time() - t0)
                t0 = time.time()
                # timed run carries NO stats: the block-count instrumentation
                # is two extra Spark jobs that belong to the bench, not the
                # operator
                q.bm25_topk_wand(
                    spark, tables, text, k=10, config=forced
                ).collect()
                wd_t.append(time.time() - t0)
            stats: dict = {}  # untimed instrumented run for the block counts
            q.bm25_topk_wand(
                spark, tables, text, k=10, config=forced, stats=stats
            ).collect()
            per_query.append(
                {
                    "query": text if len(text) < 60 else text[:28] + "...[rare-set]",
                    "sum_df": sum_df,
                    "exhaustive_sec": round(min(ex_t), 3),
                    "wand_sec": round(min(wd_t), 3),
                    "wand_wins": min(wd_t) < min(ex_t),
                    "blocks_total": stats.get("n_blocks_total"),
                    "blocks_survived": stats.get("n_blocks_survived"),
                }
            )
        results.append({"n_docs": n_docs, "queries": per_query})
        print(json.dumps(results[-1]))

    # crossover: smallest sum_df where WAND won AND actually pruned —
    # a "win" with blocks_survived == blocks_total is host-timing noise,
    # not evidence
    wins = sorted(
        pq["sum_df"]
        for r in results
        for pq in r["queries"]
        if pq["wand_wins"]
        and pq["blocks_survived"] is not None
        and pq["blocks_survived"] < pq["blocks_total"]
    )
    crossover = wins[0] if wins else None
    out = {
        "results": results,
        "crossover_sum_df": crossover,
        "note": (
            "Crossover counts only wins with real pruning "
            "(blocks_survived < blocks_total). Two conditions must hold for "
            "WAND to pay (both routed in bm25_topk_wand): decode volume "
            "sum_df above EngineConfig.wand_min_postings (set just under "
            "the smallest winning sum_df here), and selectivity — rare "
            "terms (df <= n_docs/wand_rare_df_divisor) covering >= k docs, "
            "so the seed's theta rises above common-only blocks' UB. "
            "All-common-term queries never prune (every group's UB stays "
            "above theta) and correctly route exhaustive; a single hapax "
            "term cannot lift the k-th best and also routes exhaustive."
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/wand_crossover.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"crossover_sum_df": crossover}))
    spark.stop()


if __name__ == "__main__":
    main()

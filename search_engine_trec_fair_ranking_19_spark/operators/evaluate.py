"""Evaluation harness — rebuild of `T/metrics/ThemisEval.java:73-371` (V1-V3).

Loops queries on the driver (reference: 635 queries) against the loaded index,
computes AP / nDCG per query with the reference's judged-only semantics, and
emits the same summary shape (avg/min/max AP, nDCG, timing) as the reference's
``evaluation_*.txt`` files, as a small DataFrame + dict.
"""

from __future__ import annotations

import math
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..oracle.engine import average_precision, ndcg
from .index_build import IndexTables
from .query import bm25_topk, topk_with_docs, vsm_topk


def read_judgments(
    spark: SparkSession, path: str
) -> tuple[list[tuple[int, str]], dict[int, dict[str, int]]]:
    """S9 judgments scan — rebuild of the eval-file reader
    (`ThemisEval.java:113-130`): JSONL ``{qid, query, documents: [{doc_id,
    relevance}]}`` → (queries list, qid → {doc_id: relevance}).

    `spark.read.json` replaces the hand parser; the result is driver-sized
    (hundreds of queries), so collect is correct here."""
    df = spark.read.json(path)
    queries: list[tuple[int, str]] = []
    judgments: dict[int, dict[str, int]] = {}
    for row in df.collect():
        qid = int(row["qid"])
        queries.append((qid, row["query"]))
        judgments[qid] = {
            d["doc_id"]: int(d["relevance"]) for d in (row["documents"] or [])
        }
    return queries, judgments


def evaluate(
    spark: SparkSession,
    tables: IndexTables,
    queries: list[tuple[int, str]],
    judgments: dict[int, dict[str, int]],  # qid -> {url: relevance}
    model: str = "bm25",
    k: int | None = None,
    pagerank_weight: float = 0.0,
) -> tuple[DataFrame, dict]:
    """Run every query, score vs judgments. Returns (per-query DF, summary)."""
    runner: Callable = {"bm25": bm25_topk, "vsm": vsm_topk}[model]
    rows = []
    for qid, qtext in queries:
        t0 = time.time()
        topk = runner(spark, tables, qtext, k=k, pagerank_weight=pagerank_weight)
        ranked = [
            r["url"] for r in topk_with_docs(spark, tables, topk).collect()
        ]
        dt = time.time() - t0
        rel = judgments.get(qid, {})
        rows.append(
            (
                qid,
                qtext,
                float(average_precision(ranked, rel)),
                float(ndcg(ranked, rel)),
                len(ranked),
                dt,
            )
        )
    per_query = spark.createDataFrame(
        rows, "qid int, query string, avep double, ndcg double, n_results int, seconds double"
    )
    valid_ap = [r[2] for r in rows if not math.isnan(r[2])]
    valid_nd = [r[3] for r in rows if not math.isnan(r[3])]
    times = [r[5] for r in rows]
    summary = {
        "n_queries": len(rows),
        "avg_avep": sum(valid_ap) / len(valid_ap) if valid_ap else float("nan"),
        "min_avep": min(valid_ap) if valid_ap else float("nan"),
        "max_avep": max(valid_ap) if valid_ap else float("nan"),
        "avg_ndcg": sum(valid_nd) / len(valid_nd) if valid_nd else float("nan"),
        "min_ndcg": min(valid_nd) if valid_nd else float("nan"),
        "max_ndcg": max(valid_nd) if valid_nd else float("nan"),
        "avg_seconds": sum(times) / len(times) if times else 0.0,
        "min_seconds": min(times) if times else 0.0,
        "max_seconds": max(times) if times else 0.0,
    }
    return per_query, summary

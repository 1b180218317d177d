"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25+ top-k over sf0.001; ``queries()``
exposes every implemented operator (SURVEY.md §2 + the training-data-pipeline
extensions); ``oracle_sql()`` gives DuckDB twins for everything
ANSI-SQL-expressible (the BM25/VSM oracles are independent SQL
reimplementations of the reference math, so the comparison is a real
cross-engine check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from search_engine_trec_fair_ranking_19_spark.entry_queries import (
    ORACLE_SQL,
    QUERIES,
    gate_index,
)
from search_engine_trec_fair_ranking_19_spark.operators.query import (
    bm25_topk,
    topk_with_docs,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full pipeline: index build (resumable, cached across calls) → BM25+ top-20
    → display-field projection (J4)."""
    tables = gate_index(spark, SF0001)
    topk = bm25_topk(spark, tables, "spark shuffle partition table", k=20)
    return topk_with_docs(spark, tables, topk)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins; non-SQL-expressible ops omitted
    (pagerank fixpoint, seeded MinHash/SimHash/LSH families, synthetic media)
    → driver records the weaker rows-only check for those."""
    return dict(ORACLE_SQL)

"""PySpark-native full-text indexing + BM25 retrieval engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
engine ``tasxatzial/search-engine-trec-fair-ranking-19`` ("Themis"), re-targeted
to Common-Crawl-style webtext tables at cluster scale. See SURVEY.md for the
operator-by-operator mapping and ARCHITECTURE.md for the physical design.
"""

from .config import DEFAULT_CONFIG, EngineConfig

__all__ = ["DEFAULT_CONFIG", "EngineConfig"]

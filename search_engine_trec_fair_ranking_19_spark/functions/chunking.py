"""Context-length chunking: split documents into fixed-token windows.

The last preprocessing step before tokenizer+packing in an LLM data
pipeline: a 100k-token page must become ceil-many max_len-token training
windows, optionally overlapping so no sentence is ever seen only as a
truncation boundary. At 100 TB this must be a map-only JVM projection —
one row in, n_chunks rows out, no Python, no shuffle — which is exactly
what `split` → `sequence` → `explode` → `slice` compiles to: the whole
operator is Catalyst expressions inside one WholeStageCodegen span.

Chunk identity is positional and deterministic: chunk i of doc d covers
tokens [i*stride, i*stride + max_len) in document order, so two engines
(or two runs at different cluster sizes) produce byte-identical chunks —
the property that makes chunk-level dedup and train/val splits stable
downstream (chunk keys concatenate cleanly with the md5 machinery in
``sampling.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import ws_tokens


def chunk_tokens(
    df: DataFrame,
    max_len: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """One row per (doc, chunk): ``(id_col, *carry_cols, chunk_id,
    n_tokens, chunk)``. ``carry_cols`` are document-level columns carried
    through the generator onto every chunk (split label, source, lang) —
    a projection, never a join back on the id.

    ``chunk`` is the whitespace re-join of tokens
    ``[chunk_id*stride, chunk_id*stride + max_len)`` where
    ``stride = max_len - overlap``. Chunk count is the COVERAGE count:
    the minimum number of windows whose union is the whole document —
    ``ceil((n - max_len) / stride) + 1`` for non-empty docs. A doc with
    n <= max_len tokens yields exactly one chunk, an empty/whitespace-only
    doc yields none, and no chunk is ever fully contained in its
    predecessor (the redundant trailing windows a naive
    "every stride start" rule emits).

    Plan shape: map-only generator — no shuffle, no UDF; the token array
    is built once per row and sliced per chunk inside codegen.
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    if not 0 <= overlap < max_len:
        raise ValueError(
            f"overlap must be in [0, max_len), got {overlap} for max_len {max_len}"
        )
    stride = max_len - overlap
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    # coverage count: ceil((n - max_len)/stride) + 1, zero for empty docs
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        F.greatest(
            F.ceil((n - F.lit(max_len)) / F.lit(stride)).cast("int"), F.lit(0)
        )
        + F.lit(1)
    )
    carry = list(carry_cols)
    return (
        df.select(
            F.col(id_col), *carry, toks.alias("__toks"), n_chunks.alias("__nc")
        )
        .filter(F.col("__nc") > 0)
        .select(
            id_col,
            *carry,
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
            F.col("__toks"),
        )
        .select(
            id_col,
            *carry,
            F.col("chunk_id"),
            F.slice(
                F.col("__toks"), F.col("chunk_id") * stride + 1, max_len
            ).alias("__chunk_toks"),
        )
        .select(
            id_col,
            *carry,
            F.col("chunk_id"),
            F.size("__chunk_toks").alias("n_tokens"),
            F.array_join("__chunk_toks", " ").alias("chunk"),
        )
    )

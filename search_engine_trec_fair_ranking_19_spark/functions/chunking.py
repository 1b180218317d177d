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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket
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


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Concat-and-split sequence packing: the token streams of all documents,
    concatenated in a deterministic order, cut into fixed ``seq_len`` windows
    — the step that turns variable-length curated documents into the
    constant-shape training sequences an LLM data loader consumes, with zero
    padding anywhere but each bucket's final sequence.

    One row per (document, sequence) intersection:
    ``(id_col, bucket, seq_id, pos_in_seq, n_tokens, piece)`` — ``seq_id`` is
    bucket-local, ``pos_in_seq`` is the piece's token offset inside its
    sequence, and concatenating a sequence's pieces in ``pos_in_seq`` order
    yields exactly ``seq_len`` tokens (every bucket's last sequence may be
    short). A document longer than ``seq_len`` simply spans several
    sequences; nothing is ever dropped or duplicated.

    Determinism and scale share one mechanism: documents are routed to
    ``n_buckets`` md5 buckets (`sampling.hash_bucket` — bit-identical in
    Spark/DuckDB/Python) and concatenated in (md5-hex, key) order WITHIN each
    bucket, so the packing is a pure function of (keys, texts, seq_len,
    n_buckets) — independent of partition layout and cluster size — while
    the only exchange is the bucket hash-partition. The per-bucket running
    offset is a streaming window over the bucket's sort (Spark's external
    sort spills; no bucket ever needs to fit in memory), and the
    piece arithmetic after it (`sequence` → `explode` → `slice`) is the same
    map-only codegen generator as `chunk_tokens`. A global ORDER BY — the
    naive way to make packing deterministic — would be one serial sort of
    the corpus; buckets make it ``n_buckets``-way parallel, and sequence
    identity stays stable because ids are (bucket, seq_id) pairs.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    key = F.col(id_col)
    base = (
        df.select(
            key,
            ws_tokens(F.col(text_col)).alias("__toks"),
            F.md5(key.cast("string")).alias("__hkey"),
            hash_bucket(key, n_buckets).cast("int").alias("bucket"),
        )
        .withColumn("__n", F.size("__toks").cast("long"))
        .filter(F.col("__n") > 0)
    )
    # exclusive per-bucket prefix sum = this doc's offset in the bucket's
    # concatenated token stream
    w = (
        Window.partitionBy("bucket")
        .orderBy("__hkey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("__n").over(w), F.lit(0))
    placed = base.withColumn("__off", off)
    first_seq = F.floor(F.col("__off") / seq_len)
    last_seq = F.floor((F.col("__off") + F.col("__n") - 1) / seq_len)
    exploded = placed.select(
        id_col,
        "bucket",
        "__toks",
        "__n",
        "__off",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    local_start = F.greatest(
        F.lit(0).cast("long"), F.col("seq_id") * seq_len - F.col("__off")
    )
    local_end = F.least(
        F.col("__n"), (F.col("seq_id") + 1) * seq_len - F.col("__off")
    )
    piece = F.slice(
        F.col("__toks"),
        (local_start + 1).cast("int"),
        (local_end - local_start).cast("int"),
    )
    return exploded.select(
        id_col,
        "bucket",
        F.col("seq_id"),
        (F.col("__off") + local_start - F.col("seq_id") * seq_len)
        .cast("int")
        .alias("pos_in_seq"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("piece"),
    )

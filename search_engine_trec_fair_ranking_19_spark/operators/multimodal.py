"""Multimodal (image/audio/video) column plumbing.

Media rides as opaque ``binary`` columns with typed metadata; transforms are
``mapInPandas`` stages so bytes stay in Arrow batches end-to-end. The actual
codec calls (PIL/ffmpeg/librosa) are NOT available in this environment, so the
decode kernel is pluggable: the default raises ``NotImplementedError`` and a
deterministic fake (`fake_feature_extractor`) exercises the full Spark-side
path — schema, batching, partition sizing — in tests and benchmarks.

Scale notes: media rows are large and variable — `repartition_for_media`
targets a bytes-per-partition budget (not a row count) so executor memory is
bounded regardless of asset-size skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, media binary, media_type string, width int, height int, "
    "duration_ms int"
)

FEATURES_SCHEMA_DDL = "media_id long, media_type string, features array<float>"


def real_decode(media: bytes, media_type: str) -> np.ndarray:
    """Decode media bytes to a feature vector. Requires codec libraries that
    are intentionally not vendored here — plug in PIL/torchaudio/decord."""
    raise NotImplementedError(
        "media decoding requires image/audio codec libraries not present in "
        "this environment; inject a decoder into extract_features(decoder=...)"
    )


def fake_feature_extractor(media: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: 8 floats derived from a blake2b digest of the
    bytes — stable across runs/machines, so tests can assert exact values."""
    digest = hashlib.blake2b(media, digest_size=32).digest()
    raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
    return (raw / np.float64(2**32)).astype(np.float32)


def sha_feature_extractor(media: bytes, media_type: str) -> np.ndarray:
    """Deterministic extractor whose output an ANSI-SQL engine can replicate
    exactly: feature i = first 6 hex chars of the i-th 8-char chunk of
    sha256(media), as a 24-bit fraction. 24 bits fit a float32 mantissa
    exactly, so the stored float equals the double both engines compute —
    the correctness gate uses this to verify the whole mapInPandas media
    path (schema, batching, vector output) against a DuckDB oracle
    (`sha256(text)` + hex-cast arithmetic)."""
    h = hashlib.sha256(media).hexdigest()
    vals = [int(h[i * 8 : i * 8 + 6], 16) / float(1 << 24) for i in range(8)]
    return np.array(vals, dtype=np.float32)


def extract_features(
    media_df: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = real_decode,
    batch_rows: int = 64,
) -> DataFrame:
    """binary media → feature vectors via mapInPandas (Arrow batches)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(bytes(m), t)
                for m, t in zip(pdf["media"].values, pdf["media_type"].values)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "features": feats,
                }
            )

    return media_df.select("media_id", "media", "media_type").mapInPandas(
        gen, schema=FEATURES_SCHEMA_DDL
    )


def repartition_for_media(
    media_df: DataFrame, target_bytes_per_partition: int = 256 << 20
) -> DataFrame:
    """Size partitions by accumulated media BYTES, not rows: compute total
    payload, derive the partition count, hash-repartition."""
    total = media_df.select(
        F.sum(F.length("media")).alias("bytes")
    ).head()["bytes"] or 0
    n_parts = max(1, int(total // target_bytes_per_partition) + 1)
    return media_df.repartition(n_parts, "media_id")


def frame_sample_plan(video_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand each video row into (media_id, frame_ts_ms) sampling instants —
    the JVM-side half of frame extraction (the decode itself is the pluggable
    kernel above). Demonstrates the explode-then-decode layout that keeps
    per-frame work row-parallel."""
    return video_df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n_rows: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests/benches (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, int(rng.integers(64, 2048)), dtype=np.uint8)
        rows.append(
            (
                i,
                bytes(payload.tobytes()),
                kind,
                int(rng.integers(16, 4096)) if kind == "image" else 0,
                int(rng.integers(16, 4096)) if kind == "image" else 0,
                int(rng.integers(1000, 60000)) if kind != "image" else 0,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)

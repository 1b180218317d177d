"""Multimodal plumbing tests — the decode kernel is a deterministic fake, the
Spark-side path (schema, Arrow batching, byte-budget partitioning) is real."""

import numpy as np
import pytest

from search_engine_trec_fair_ranking_19_spark.operators import multimodal as mm


def test_extract_features_fake_decoder(spark):
    media = mm.synthetic_media(spark, n_rows=30)
    feats = mm.extract_features(media, decoder=mm.fake_feature_extractor)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # determinism: same media -> same features
    raw = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    for r in rows:
        expected = mm.fake_feature_extractor(raw[r["media_id"]], r["media_type"])
        assert np.allclose(r["features"], expected, atol=1e-7)


def test_real_decode_is_gated(spark):
    media = mm.synthetic_media(spark, n_rows=2)
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(media).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codec" in str(
        exc_info.value
    )


def test_repartition_by_bytes(spark):
    media = mm.synthetic_media(spark, n_rows=40)
    out = mm.repartition_for_media(media, target_bytes_per_partition=8 << 10)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 40


def test_frame_sample_plan(spark):
    media = mm.synthetic_media(spark, n_rows=9)
    plan = mm.frame_sample_plan(media, every_ms=5000)
    rows = plan.collect()
    assert rows, "expected at least one video row"
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("media_type = 'video'").collect()
    }
    from collections import Counter

    per_vid = Counter(r["media_id"] for r in rows)
    for vid, cnt in per_vid.items():
        assert cnt == len(range(0, max(durations[vid] - 1, 0) + 1, 5000))

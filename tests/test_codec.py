"""Property tests for the delta+varint posting-block codec."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_trec_fair_ranking_19_spark.functions.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=300)
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(raw_ids):
    docids = np.unique(np.array(raw_ids, dtype=np.int64))
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 1000, docids.size).astype(np.int64)
    dls = rng.integers(1, 10000, docids.size).astype(np.int64)
    g, t, d = encode_block(docids, tfs, dls)
    dec_ids, dec_tfs, dec_dls = decode_block(g, t, d)
    assert np.array_equal(dec_ids, docids)
    assert np.array_equal(dec_tfs, tfs)
    assert np.array_equal(dec_dls, dls)


def test_empty_block():
    g, t, d = encode_block(
        np.array([], dtype=np.int64),
        np.array([], dtype=np.int64),
        np.array([], dtype=np.int64),
    )
    ids, tfs, dls = decode_block(g, t, d)
    assert ids.size == tfs.size == dls.size == 0


def test_delta_monotone():
    ids = np.array([5, 6, 100, 10**12], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_compression_beats_fixed_width():
    # dense ascending docids (the common in-block case) should take ~2 bytes
    # per posting for (gap, tf) vs the reference's fixed 8 (Posting.SIZE)
    docids = np.arange(10**6, 10**6 + 4096, dtype=np.int64)
    tfs = np.ones(4096, dtype=np.int64)
    dls = np.full(4096, 124, dtype=np.int64)
    g, t, d = encode_block(docids, tfs, dls)
    assert len(g) + len(t) < 8 * 4096 / 3

"""Batched (concatenated multi-block) codec must be byte-identical per block
to the single-block encoder, for any block partitioning."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_trec_fair_ranking_19_spark.functions.codec import (
    decode_block,
    encode_block,
    encode_blocks_concat,
    varint_encode,
    varint_encode_sizes,
)


def _split(bounds, buf):
    return [bytes(buf[bounds[i] : bounds[i + 1]]) for i in range(len(bounds) - 1)]


@given(
    st.lists(
        st.lists(st.integers(0, 2**40), min_size=1, max_size=50),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_concat_encode_matches_per_block(blocks_raw):
    # build ascending docids per block
    blocks = []
    for raw in blocks_raw:
        ids = np.cumsum(np.asarray(raw, dtype=np.int64) % 1000 + 1)
        tfs = (np.asarray(raw, dtype=np.int64) % 77) + 1
        dls = (np.asarray(raw, dtype=np.int64) % 500) + 1
        blocks.append((ids, tfs, dls))

    docids = np.concatenate([b[0] for b in blocks])
    tfs = np.concatenate([b[1] for b in blocks])
    dls = np.concatenate([b[2] for b in blocks])
    offsets = np.concatenate(
        ([0], np.cumsum([len(b[0]) for b in blocks]))
    ).astype(np.int64)

    gb, gbuf, tb, tbuf, db, dbuf = encode_blocks_concat(docids, tfs, dls, offsets)
    got = list(zip(_split(gb, gbuf), _split(tb, tbuf), _split(db, dbuf)))

    for (ids, tf, dl), (g, t, d) in zip(blocks, got):
        eg, et, ed = encode_block(ids, tf, dl)
        assert (g, t, d) == (eg, et, ed)
        rid, rtf, rdl = decode_block(g, t, d)
        assert np.array_equal(rid, ids)
        assert np.array_equal(rtf, tf)
        assert np.array_equal(rdl, dl)


@given(st.lists(st.integers(0, 2**63 - 1), max_size=200))
@settings(max_examples=60, deadline=None)
def test_varint_sizes_sum_to_length(values):
    arr = np.asarray(values, dtype=np.uint64)
    buf, sizes = varint_encode_sizes(arr)
    assert int(sizes.sum()) == len(buf)
    assert varint_encode(arr) == buf


def test_empty_concat():
    empty = np.empty(0, dtype=np.int64)
    gb, gbuf, tb, tbuf, db, dbuf = encode_blocks_concat(
        empty, empty, empty, np.array([0], dtype=np.int64)
    )
    assert gbuf == b"" and len(gb) == 1

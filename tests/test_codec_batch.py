"""Batched (concatenated multi-block) codec must be byte-identical per block
to the single-block encoder, for any block partitioning."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_trec_fair_ranking_19_spark.functions.codec import (
    decode_block,
    decode_blocks_concat,
    encode_block,
    encode_blocks_concat,
    varint_encode,
    varint_decode_concat,
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


@given(
    st.lists(
        st.lists(st.integers(0, 2**40), min_size=0, max_size=50),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_concat_decode_matches_per_block(blocks_raw):
    # roundtrip: encode_blocks_concat -> decode_blocks_concat recovers every
    # block exactly, and the value offsets match the input partitioning
    # (empty blocks included — a term whose postings all fell in other
    # segments still produces a zero-length block row)
    blocks = []
    for raw in blocks_raw:
        ids = np.cumsum(np.asarray(raw, dtype=np.int64) % 1000 + 1)
        tfs = (np.asarray(raw, dtype=np.int64) % 77) + 1
        dls = (np.asarray(raw, dtype=np.int64) % 500) + 1
        blocks.append((ids, tfs, dls))

    docids = np.concatenate([b[0] for b in blocks] or [np.empty(0, np.int64)])
    tfs = np.concatenate([b[1] for b in blocks] or [np.empty(0, np.int64)])
    dls = np.concatenate([b[2] for b in blocks] or [np.empty(0, np.int64)])
    offsets = np.concatenate(
        ([0], np.cumsum([len(b[0]) for b in blocks]))
    ).astype(np.int64)

    gb, gbuf, tb, tbuf, db, dbuf = encode_blocks_concat(docids, tfs, dls, offsets)
    d2, t2, l2, voff = decode_blocks_concat(gbuf, gb, tbuf, tb, dbuf, db)
    assert (voff == offsets).all()
    assert (d2 == docids).all() and (t2 == tfs).all() and (l2 == dls).all()

    # per-block parity with the scalar decoder
    for i, (ids, tf, dl) in enumerate(blocks):
        a, b, c = decode_block(
            gbuf[gb[i] : gb[i + 1]], tbuf[tb[i] : tb[i + 1]], dbuf[db[i] : db[i + 1]]
        )
        assert (a == ids).all() and (b == tf).all() and (c == dl).all()


@given(st.lists(st.lists(st.integers(0, 2**63 - 1), max_size=30), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_varint_decode_concat_matches_per_stream(streams):
    bufs = [varint_encode(np.asarray(s, dtype=np.uint64)) for s in streams]
    byte_off = np.concatenate(([0], np.cumsum([len(b) for b in bufs]))).astype(np.int64)
    values, voff = varint_decode_concat(b"".join(bufs), byte_off)
    for i, s in enumerate(streams):
        assert values[voff[i] : voff[i + 1]].tolist() == s

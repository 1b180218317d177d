"""Context-length chunking: positional determinism + map-only plan."""

import pytest
from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.functions import chunking


def _py_chunks(text, max_len, overlap):
    import math

    toks = [t for t in text.split() if t]
    if not toks:
        return []
    stride = max_len - overlap
    nc = max(math.ceil((len(toks) - max_len) / stride), 0) + 1
    return [toks[i * stride : i * stride + max_len] for i in range(nc)]


@pytest.mark.parametrize("max_len,overlap", [(5, 0), (5, 2), (8, 7), (1, 0)])
def test_chunks_match_python_reference(spark, max_len, overlap):
    texts = [
        "a b c d e f g h i j k l m",
        "one two three",
        "   ",
        "",
        "x",
        " ".join(f"t{i}" for i in range(23)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk"])
        for r in chunking.chunk_tokens(df, max_len, overlap).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for ci, ch in enumerate(_py_chunks(t, max_len, overlap)):
            want[(i, ci)] = (len(ch), " ".join(ch))
    assert got == want


def test_every_token_covered_and_overlap_exact(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100)))], "doc_id long, text string"
    )
    rows = sorted(
        chunking.chunk_tokens(df, 16, 4).collect(), key=lambda r: r["chunk_id"]
    )
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(rows, rows[1:]):
        ta, tb = a["chunk"].split(), b["chunk"].split()
        assert ta[-4:] == tb[:4]
    # concatenation minus overlaps reproduces the doc
    merged = rows[0]["chunk"].split()
    for r in rows[1:]:
        merged += r["chunk"].split()[4:]
    assert merged == [f"w{i}" for i in range(100)]


def test_chunking_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunking.chunk_tokens(df, 4, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_chunking_validates_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunking.chunk_tokens(df, 0)
    with pytest.raises(ValueError):
        chunking.chunk_tokens(df, 4, 4)
    with pytest.raises(ValueError):
        chunking.chunk_tokens(df, 4, -1)


# --- pack_sequences ----------------------------------------------------------

SEQ_LEN = 16
N_BUCKETS = 4


@pytest.fixture(scope="module")
def packing_corpus(spark):
    # lengths straddle seq_len: empty, short, exactly seq_len, multi-sequence
    texts = {
        i: " ".join(f"d{i}w{j}" for j in range(n))
        for i, n in enumerate([3, 16, 0, 40, 7, 1, 33, 90, 16, 5])
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    return texts, chunking.pack_sequences(
        df, SEQ_LEN, n_buckets=N_BUCKETS
    ).collect()


def test_pack_sequences_full_except_last(packing_corpus):
    """Every (bucket, seq_id) holds exactly seq_len tokens except each
    bucket's final sequence, and pieces tile [0, seq_len) without gaps."""
    _, rows = packing_corpus
    seqs = {}
    for r in rows:
        seqs.setdefault((r["bucket"], r["seq_id"]), []).append(r)
    last_per_bucket = {}
    for b, s in seqs:
        last_per_bucket[b] = max(last_per_bucket.get(b, -1), s)
    for (b, s), pieces in seqs.items():
        pieces.sort(key=lambda r: r["pos_in_seq"])
        # contiguous tiling from position 0
        pos = 0
        for p in pieces:
            assert p["pos_in_seq"] == pos
            assert p["n_tokens"] == len(p["piece"].split())
            pos += p["n_tokens"]
        if s != last_per_bucket[b]:
            assert pos == SEQ_LEN, f"sequence ({b},{s}) has {pos} tokens"
        else:
            assert 0 < pos <= SEQ_LEN


def test_pack_sequences_reconstructs_every_document(packing_corpus):
    """Concatenating one doc's pieces in (seq_id) order reproduces its
    token stream exactly: nothing dropped, nothing duplicated."""
    texts, rows = packing_corpus
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in texts.items():
        toks = text.split()
        if not toks:
            assert i not in by_doc
            continue
        pieces = sorted(by_doc[i], key=lambda r: r["seq_id"])
        merged = [t for p in pieces for t in p["piece"].split()]
        assert merged == toks, f"doc {i} not reconstructed"


def test_pack_sequences_partition_invariant(spark, packing_corpus):
    """Identical output under a different partitioning — packing is a pure
    function of (keys, texts, seq_len, n_buckets), never of layout."""
    texts, rows = packing_corpus
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    ).repartition(7)
    again = chunking.pack_sequences(df, SEQ_LEN, n_buckets=N_BUCKETS).collect()
    key = lambda r: (r["bucket"], r["seq_id"], r["pos_in_seq"])
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows)), key


def test_pack_sequences_single_exchange(spark):
    """Plan: ONE shuffle (the bucket hash-partition feeding the window);
    the piece generator after it is map-only codegen."""
    df = spark.createDataFrame([(1, "a b c"), (2, "d e")], "doc_id long, text string")
    plan = (
        chunking.pack_sequences(df, 4, n_buckets=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_pack_sequences_validates_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunking.pack_sequences(df, 0)
    with pytest.raises(ValueError):
        chunking.pack_sequences(df, 4, n_buckets=0)

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

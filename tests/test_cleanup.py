"""Line-level cleanup transforms: intra-doc dedup_lines and corpus-level
remove_boilerplate_lines — edge semantics + physical-plan shape."""

from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.functions import (
    text_analysis as ta,
)
from search_engine_trec_fair_ranking_19_spark.operators import curate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_lines_first_occurrence_order(spark):
    df = _docs(spark, [(1, "a\nb\na\nc\nb\na")])
    out = df.select(ta.dedup_lines(F.col("text")).alias("t")).head()["t"]
    assert out == "a\nb\nc"


def test_dedup_lines_crlf_and_whitespace(spark):
    # CRLF lines dedup against their LF twins; whitespace-only lines drop
    df = _docs(spark, [(1, "nav\r\nbody\n   \nnav\n\t\nbody  ")])
    out = df.select(ta.dedup_lines(F.col("text")).alias("t")).head()["t"]
    assert out == "nav\nbody"


def test_dedup_lines_empty_and_no_dup(spark):
    df = _docs(spark, [(1, ""), (2, "x\ny")])
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", ta.dedup_lines(F.col("text")).alias("t")
        ).collect()
    }
    assert got == {1: "", 2: "x\ny"}


def test_dedup_lines_is_map_only(spark):
    df = _docs(spark, [(1, "a\nb")])
    plan = (
        df.select(ta.dedup_lines(F.col("text")).alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_boilerplate_removal_semantics(spark):
    # "footer" is in 3 docs, "menu" in 2, body lines in 1 each;
    # doc 4 is ONLY boilerplate, doc 5 has no non-empty lines
    df = _docs(
        spark,
        [
            (1, "body one\nfooter\nmenu"),
            (2, "body two\nfooter"),
            (3, "menu\nbody three\nfooter\nbody three"),
            (4, "footer\nmenu"),
            (5, "   \n\t"),
        ],
    )
    out = {
        r["doc_id"]: (
            r["clean_text"],
            r["n_lines_kept"],
            r["n_lines_removed"],
        )
        for r in curate.remove_boilerplate_lines(df, min_docs=2).collect()
    }
    assert out[1] == ("body one", 1, 2)
    assert out[2] == ("body two", 1, 1)
    # duplicate body line within doc 3 counts once toward DF (stays), and
    # both copies survive in order
    assert out[3] == ("body three\nbody three", 2, 2)
    assert out[4] == ("", 0, 2)
    assert out[5] == ("", 0, 0)
    assert set(out) == {1, 2, 3, 4, 5}


def test_boilerplate_removal_threshold(spark):
    df = _docs(spark, [(1, "a\nb"), (2, "a\nc")])
    out = {
        r["doc_id"]: r["clean_text"]
        for r in curate.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    # nothing reaches DF 3 -> identity (modulo line normalization)
    assert out == {1: "a\nb", 2: "a\nc"}


def test_boilerplate_removal_plan_shape(spark):
    out = curate.remove_boilerplate_lines(
        _docs(spark, [(1, "a\nb"), (2, "a\nc")]), min_docs=2
    )
    out.collect()  # let AQE finalize: it sees the tiny filtered side
    full = out._jdf.queryExecution().executedPlan().toString()
    # the rendering appends the pre-AQE "Initial Plan" (which says
    # SortMergeJoin) below the final one — pin the final section only
    plan = full.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan, plan
    # the boilerplate side is small AFTER the >= min_docs filter; the
    # static plan says SortMergeJoin, and AQE must convert it to a
    # broadcast at runtime — that conversion is the scale property
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_prepare_training_set_clean_lines_composition(spark):
    # one doc whose second half repeats its first line; with clean_lines
    # the chunks are built from the deduped text
    df = spark.createDataFrame(
        [(1, "alpha beta gamma\nalpha beta gamma", "s1")],
        "doc_id long, text string, source string",
    )
    kw = dict(max_len=10, langs=("unk",), min_quality=0.0)
    base = curate.prepare_training_set(df, **kw)
    cleaned = curate.prepare_training_set(df, clean_lines=True, **kw)
    assert base.agg(F.sum("n_tokens")).head()[0] == 6
    assert cleaned.agg(F.sum("n_tokens")).head()[0] == 3


def test_prepare_training_set_boilerplate_composition(spark):
    df = spark.createDataFrame(
        [
            (1, "unique alpha words\nshared footer line", "s1"),
            (2, "different beta words\nshared footer line", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    out = curate.prepare_training_set(
        df, max_len=10, boilerplate_min_docs=2, langs=("unk",),
        min_quality=0.0,
    )
    toks = {t for r in out.collect() for t in r["chunk"].split()}
    assert "footer" not in toks and "shared" not in toks
    assert {"unique", "alpha", "different", "beta"} <= toks

"""Deterministic sampling/split tests: stability under repartition, key
consistency across tables, boundary exactness, md5 cross-engine parity."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_trec_fair_ranking_19_spark.functions import sampling


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_bucket_matches_python_and_duckdb(spark):
    got = {
        r["doc_id"]: r["b"]
        for r in _ids(spark, 50)
        .select("doc_id", sampling.hash_bucket(F.col("doc_id")).alias("b"))
        .collect()
    }
    for i in range(50):
        py = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000
        assert got[i] == py
    con = duckdb.connect()
    duck = con.sql(
        "SELECT i, ('0x' || substr(md5(i::VARCHAR), 1, 8))::UBIGINT % 1000000"
        " FROM range(50) t(i)"
    ).fetchall()
    assert all(got[i] == b for i, b in duck)


def test_sample_stable_under_repartition(spark):
    df = _ids(spark)
    s1 = {r["doc_id"] for r in sampling.deterministic_sample(df, 0.25).collect()}
    s2 = {
        r["doc_id"]
        for r in sampling.deterministic_sample(df.repartition(17), 0.25).collect()
    }
    assert s1 == s2
    assert 0.2 < len(s1) / 2000 < 0.3


def test_sample_consistent_across_tables(spark):
    # same key + rate selects the same ENTITIES from different tables
    docs = _ids(spark).withColumn("text", F.lit("x"))
    embs = _ids(spark).withColumn("vec", F.lit(1.0))
    a = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.1).collect()}
    b = {r["doc_id"] for r in sampling.deterministic_sample(embs, 0.1).collect()}
    assert a == b


def test_sample_rate_edges(spark):
    df = _ids(spark, 100)
    assert sampling.deterministic_sample(df, 0.0).count() == 0
    assert sampling.deterministic_sample(df, 1.0).count() == 100
    with pytest.raises(ValueError):
        sampling.deterministic_sample(df, 1.5)


def test_split_partitions_exactly(spark):
    df = _ids(spark)
    out = sampling.deterministic_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # no gaps, no overlaps
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # weights normalize: 8/1/1 == 0.8/0.1/0.1
    out2 = sampling.deterministic_split(df, {"train": 8, "val": 1, "test": 1})
    assert out.select("doc_id", "split").exceptAll(
        out2.select("doc_id", "split")
    ).count() == 0


def test_split_stable_and_disjoint_from_sample(spark):
    # membership is a pure function of the key: recomputing yields bytes-
    # identical assignment, and the val/test sets never drift into train
    df = _ids(spark, 500)
    w = {"train": 0.9, "val": 0.1}
    one = dict(
        (r["doc_id"], r["split"])
        for r in sampling.deterministic_split(df, w).collect()
    )
    two = dict(
        (r["doc_id"], r["split"])
        for r in sampling.deterministic_split(df.repartition(7), w).collect()
    )
    assert one == two


def test_split_rejects_bad_weights(spark):
    df = _ids(spark, 10)
    with pytest.raises(ValueError):
        sampling.deterministic_split(df, {})
    with pytest.raises(ValueError):
        sampling.deterministic_split(df, {"a": 0.0})


def test_stratified_sample_rates_and_determinism(spark):
    df = _ids(spark, 3000).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    out = sampling.stratified_sample(
        df, {"en": 0.5, "de": 0.1}, stratum_col="lang"
    )
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 0.4 < counts["en"] / 1000 < 0.6
    assert 0.05 < counts["de"] / 2000 < 0.15
    # strata absent from rates: default_rate (0 -> dropped entirely)
    df2 = df.withColumn("lang", F.lit("fr"))
    assert sampling.stratified_sample(df2, {"en": 0.5}, "lang").count() == 0
    assert (
        sampling.stratified_sample(df2, {"en": 0.5}, "lang", default_rate=1.0)
        .count()
        == 3000
    )
    # same key+rate == plain deterministic_sample of that stratum
    en_ids = {r["doc_id"] for r in out.filter("lang = 'en'").collect()}
    plain = {
        r["doc_id"]
        for r in sampling.deterministic_sample(
            df.filter("lang = 'en'"), 0.5
        ).collect()
    }
    assert en_ids == plain
    with pytest.raises(ValueError):
        sampling.stratified_sample(df, {"en": 2.0}, "lang")


def test_take_token_budget_prefix_semantics(spark):
    df = _ids(spark, 400).withColumn("tokens", F.col("doc_id") % 50 + 1)
    total = df.agg(F.sum("tokens")).head()[0]
    out = sampling.take_token_budget(df, int(total // 3), "tokens", n_buckets=32)
    got = out.agg(F.sum("tokens")).head()[0]
    assert got <= total // 3
    # budget is filled nearly tight (partial-bucket prefix): within one
    # bucket's worth of slack
    per_bucket = total / 32
    assert got > total // 3 - per_bucket - 50
    # membership is a strict prefix of (bucket, key) order: recomputing on
    # a repartitioned frame yields the identical set
    again = sampling.take_token_budget(
        df.repartition(13), int(total // 3), "tokens", n_buckets=32
    )
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in again.collect()
    }
    # whole corpus fits -> identity; zero budget -> empty
    assert sampling.take_token_budget(df, int(total), "tokens", n_buckets=32).count() == 400
    assert sampling.take_token_budget(df, 0, "tokens", n_buckets=32).count() == 0
    with pytest.raises(ValueError):
        sampling.take_token_budget(df, -1, "tokens")


def test_mix_corpora_epochs_and_fractions(spark):
    a = _ids(spark, 1000)
    b = _ids(spark, 1000)
    out = sampling.mix_corpora({"A": (a, 2.5), "B": (b, 0.25)})
    assert set(out.columns) == {"doc_id", "epoch", "corpus"}
    counts = {
        (r["corpus"], r["epoch"]): r["n"]
        for r in out.groupBy("corpus", "epoch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # integer epochs are FULL copies
    assert counts[("A", 0)] == 1000 and counts[("A", 1)] == 1000
    # fractional epochs are ~rate subsets
    assert 400 < counts[("A", 2)] < 600
    assert 150 < counts[("B", 0)] < 350
    assert set(counts) == {("A", 0), ("A", 1), ("A", 2), ("B", 0)}
    # fractional membership is salted per (corpus, epoch): A's partial
    # epoch and B's partial epoch select DIFFERENT key subsets
    a2 = {r["doc_id"] for r in out.filter("corpus='A' and epoch=2").collect()}
    b0 = {r["doc_id"] for r in out.filter("corpus='B' and epoch=0").collect()}
    assert a2 != b0
    # deterministic: identical multiset on a repartitioned input
    again = sampling.mix_corpora(
        {"A": (a.repartition(17), 2.5), "B": (b, 0.25)}
    )
    key = lambda r: (r["corpus"], r["epoch"], r["doc_id"])
    assert sorted(map(key, out.collect())) == sorted(map(key, again.collect()))


def test_mix_corpora_edge_weights(spark):
    a = _ids(spark, 100)
    # weight 0 part contributes nothing
    out = sampling.mix_corpora({"A": (a, 1.0), "Z": (a, 0.0)})
    assert out.filter("corpus='Z'").count() == 0
    assert out.count() == 100
    with pytest.raises(ValueError):
        sampling.mix_corpora({"A": (a, -0.1)})
    with pytest.raises(ValueError):
        sampling.mix_corpora({"A": (a, 0.0)})

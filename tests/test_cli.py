"""End-to-end CLI surface tests: build → query → evaluate → curate → prepare.

Drives the cmd_* handlers with parsed args and the shared test session
(``main()`` owns and stops its own session, which would kill the fixture's)."""

import json

from search_engine_trec_fair_ranking_19_spark.__main__ import (
    build_parser,
    cmd_build,
    cmd_curate,
    cmd_evaluate,
    cmd_prepare,
    cmd_query,
)

_PAD = "the cat and the dog ran to the park and it was good for the day"


def _write_docs(spark, path):
    rows = [
        (1, _PAD + " alpha beta gamma delta epsilon zeta"),
        (2, _PAD + " spark shuffle partition exchange stage task"),
        (3, _PAD + " completely different content about query engines"),
        (4, _PAD + " alpha beta gamma delta epsilon zeta"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(path)


def _run(spark, capsys, argv):
    args = build_parser().parse_args(argv)
    rc = {
        "build": cmd_build,
        "query": cmd_query,
        "evaluate": cmd_evaluate,
        "curate": cmd_curate,
        "prepare": cmd_prepare,
    }[args.cmd](spark, args)
    assert rc == 0
    return capsys.readouterr().out.strip().splitlines()


def test_cli_lifecycle(spark, tmp_path, capsys):
    docs = str(tmp_path / "docs.parquet")
    index = str(tmp_path / "index")
    _write_docs(spark, docs)

    out = _run(spark, capsys, ["build", "--input", docs, "--index", index])
    built = json.loads(out[-1])
    assert built["n_docs"] == 4 and built["avgdl"] > 0

    out = _run(
        spark, capsys,
        ["query", "--index", index, "spark shuffle partition", "--k", "5"],
    )
    # doc 2 is the only one containing the query terms -> rank 1
    rank1 = out[0].split("\t")
    assert rank1[0] == "1" and rank1[1] == "doc00000002"
    assert float(rank1[2]) == 1.0  # max-normalized top score

    judgments = tmp_path / "judgments.jsonl"
    judgments.write_text(
        json.dumps(
            {
                "qid": 1,
                "query": "spark shuffle partition",
                "documents": [
                    {"doc_id": "doc00000002", "relevance": 1},
                    {"doc_id": "doc00000003", "relevance": 0},
                ],
            }
        )
        + "\n"
    )
    out = _run(
        spark, capsys,
        ["evaluate", "--index", index, "--judgments", str(judgments)],
    )
    assert out[0].startswith("qid=1") and "AP=1.0" in out[0]
    summary = json.loads(out[-1])
    assert summary["n_queries"] == 1

    curated = str(tmp_path / "curated")
    out = _run(
        spark, capsys,
        [
            # threshold 0.7: the shared pad alone puts distinct docs at
            # ~0.54 trigram-Jaccard; only the exact dup (4) must drop
            "curate", "--input", docs, "--out", curated,
            "--min-quality", "0.3", "--near-dup-threshold", "0.7",
        ],
    )
    res = json.loads(out[-1])
    # docs 1/4 are exact dups -> one dropped; 4 in, 3 kept
    assert res["in_rows"] == 4 and res["kept_rows"] == 3
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(curated).collect()
    }
    assert kept == {1, 2, 3}


def test_cli_query_window_and_models(spark, tmp_path, capsys):
    docs = str(tmp_path / "docs.parquet")
    index = str(tmp_path / "index")
    _write_docs(spark, docs)
    _run(spark, capsys, ["build", "--input", docs, "--index", index])

    # window slice: start=2 returns ranks 2..k with correct numbering
    out = _run(
        spark, capsys,
        ["query", "--index", index, "the park", "--k", "4", "--start", "2", "--end", "3"],
    )
    assert [line.split("\t")[0] for line in out] == ["2", "3"]

    for model in ("wand", "vsm", "existential"):
        out = _run(
            spark, capsys,
            ["query", "--index", index, "spark shuffle partition", "--model", model],
        )
        assert any("doc00000002" in line for line in out)


def test_cli_prepare(spark, tmp_path, capsys):
    docs = str(tmp_path / "docs.parquet")
    ev = str(tmp_path / "eval.parquet")
    out_dir = str(tmp_path / "train_set")
    _write_docs(spark, docs)
    # eval set contains doc 2's distinctive span -> doc 2 must be dropped;
    # webtext-shaped (url, text) with NO doc_id: the eval side never needs one
    spark.createDataFrame(
        [("http://b.org/q", "context spark shuffle partition exchange stage task context")],
        "url string, text string",
    ).write.mode("overwrite").parquet(ev)
    out = _run(
        spark, capsys,
        [
            "prepare", "--input", docs, "--out", out_dir,
            "--eval", ev, "--decontaminate-n", "6",
            "--split", "train=0.5,val=0.5",
            "--max-len", "8", "--overlap", "2",
            "--min-quality", "0.3", "--near-dup-threshold", "0.7",
        ],
    )
    res = json.loads(out[-1])
    assert res["out"] == out_dir and res["splits"]
    back = spark.read.parquet(out_dir)
    kept = {r["doc_id"] for r in back.select("doc_id").distinct().collect()}
    # 4 is an exact dup of 1; 2 is decontaminated away
    assert kept == {1, 3}
    assert set(back.columns) == {
        "doc_id", "source", "split", "chunk_id", "n_tokens", "chunk"
    }
    # no source column in the input and no url -> constant source
    assert {r["source"] for r in back.collect()} == {"all"}


def test_default_master_respects_spark_submit(monkeypatch):
    # under spark-submit, PythonRunner exports PYSPARK_GATEWAY_PORT and owns
    # --master; get_spark must not override the cluster with local mode
    from search_engine_trec_fair_ranking_19_spark import session

    monkeypatch.delenv("PYSPARK_GATEWAY_PORT", raising=False)
    assert session._default_master("8") == "local[8]"
    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "45123")
    assert session._default_master("8") == ""


def test_cli_prepare_token_budget(spark, tmp_path, capsys):
    docs = str(tmp_path / "docs.parquet")
    out_dir = str(tmp_path / "budget_set")
    _write_docs(spark, docs)
    full = _run(
        spark, capsys,
        [
            "prepare", "--input", docs, "--out", out_dir,
            "--split", "train=1.0", "--max-len", "8",
            "--min-quality", "0.3", "--near-dup-threshold", "0.7",
        ],
    )
    total = json.loads(full[-1])["splits"]["train"]["tokens"]
    budget = total // 2
    capped = _run(
        spark, capsys,
        [
            "prepare", "--input", docs, "--out", out_dir,
            "--split", "train=1.0", "--max-len", "8",
            "--min-quality", "0.3", "--near-dup-threshold", "0.7",
            "--token-budget", str(budget),
        ],
    )
    kept = json.loads(capped[-1])["splits"]["train"]["tokens"]
    # a deterministic md5-prefix of chunks summing to <= budget, < full
    assert 0 < kept <= budget < total
    # rerun reproduces the identical subset (pure function of the data)
    rerun = _run(
        spark, capsys,
        [
            "prepare", "--input", docs, "--out", out_dir,
            "--split", "train=1.0", "--max-len", "8",
            "--min-quality", "0.3", "--near-dup-threshold", "0.7",
            "--token-budget", str(budget),
        ],
    )
    assert json.loads(rerun[-1]) == json.loads(capped[-1])


def test_cli_prepare_clean_lines(spark, tmp_path, capsys):
    docs = str(tmp_path / "clean_docs.parquet")
    out_dir = str(tmp_path / "clean_set")
    rows = [
        (1, _PAD + " body one\nshared footer line here now", "s"),
        (2, _PAD + " body two\nshared footer line here now", "s"),
        (3, _PAD + " body three\n" + _PAD + " body three", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(docs)
    out = _run(
        spark, capsys,
        [
            "prepare", "--input", docs, "--out", out_dir,
            "--clean-lines", "--boilerplate-min-docs", "2",
            "--split", "train=1.0", "--max-len", "64",
            "--min-quality", "0.0", "--langs", "en,unk",
            "--near-dup-threshold", "0.99",
        ],
    )
    assert json.loads(out[-1])["splits"]
    text = " ".join(
        r["chunk"] for r in spark.read.parquet(out_dir).collect()
    )
    # the cross-doc footer line is gone; doc 3's duplicated line collapsed
    assert "footer" not in text
    assert text.count("three") == 1


def test_cli_build_latest_snapshot(spark, tmp_path, capsys):
    # two crawls of the same url: --latest-snapshot indexes only the newer
    # extraction, so n_docs counts pages, not crawl rows
    crawl = str(tmp_path / "crawl.parquet")
    index = str(tmp_path / "snap_index")
    from pyspark.sql import functions as F

    spark.createDataFrame(
        [
            ("https://a.example/p", 100, _PAD + " stale words here"),
            ("https://a.example/p", 200, _PAD + " fresh words here"),
            ("https://b.example/q", 150, _PAD + " only crawl of this page"),
        ],
        "url string, ts long, text string",
    ).withColumn("warc_ts", F.timestamp_seconds(F.col("ts"))).drop(
        "ts"
    ).write.mode("overwrite").parquet(crawl)

    out = _run(
        spark,
        capsys,
        ["build", "--input", crawl, "--index", index, "--latest-snapshot"],
    )
    assert json.loads(out[-1])["n_docs"] == 2

    hits = _run(
        spark,
        capsys,
        ["query", "--index", index, "fresh", "--model", "existential"],
    )
    assert any("a.example" in h for h in hits)
    stale = _run(
        spark,
        capsys,
        ["query", "--index", index, "stale", "--model", "existential"],
    )
    assert not any("a.example" in h for h in stale)

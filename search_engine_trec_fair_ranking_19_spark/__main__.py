"""Command-line surface: build / query / evaluate / curate / prepare.

The reference exposes its engine to users through an interactive app
(``Themis.java``/``Search.java``: create index, run a query, evaluate
against a judgments file); this module is the same user surface over the
Spark engine, so a reference user can drive the full lifecycle without
writing PySpark:

    python -m search_engine_trec_fair_ranking_19_spark build \
        --input /data/webtext.parquet --index /data/index
    # multi-crawl input: index only the newest snapshot of each url
    python -m search_engine_trec_fair_ranking_19_spark build \
        --input /data/crawls.parquet --index /data/index --latest-snapshot
    python -m search_engine_trec_fair_ranking_19_spark query \
        --index /data/index "spark shuffle partition" --k 10 --model bm25
    python -m search_engine_trec_fair_ranking_19_spark evaluate \
        --index /data/index --judgments judgments.jsonl --model bm25
    python -m search_engine_trec_fair_ranking_19_spark curate \
        --input /data/docs.parquet --out /data/curated
    python -m search_engine_trec_fair_ranking_19_spark prepare \
        --input /data/docs.parquet --out /data/train_set \
        --eval /data/benchmark.parquet --redact --cap-per-source 1000

Input tables may be either the engine's webtext shape (``url``, ``text``,
…) or a ``(doc_id, text, …)`` documents table, which is adapted with the
same deterministic url mapping the correctness gate uses. Output is plain
text on stdout (one result per line); exit code 0 on success.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

from pyspark.sql import SparkSession

from .config import DEFAULT_CONFIG, EngineConfig
from .session import get_spark


def _load_input(spark: SparkSession, path: str):
    from .entry_queries import documents_as_webtext

    df = spark.read.parquet(path)
    if "url" in df.columns and "text" in df.columns:
        return df
    if "doc_id" in df.columns and "text" in df.columns:
        # the shared adapter — its url mapping carries the rank-bijection
        # invariant the SQL oracles pin; never duplicate it
        return documents_as_webtext(df)
    raise SystemExit(
        f"input {path} must have (url, text, ...) or (doc_id, text, ...); "
        f"got {df.columns}"
    )


def _ensure_doc_id(docs, path: str):
    """(docs_with_doc_id, synthetic): webtext inputs get the same
    deterministic id the index build assigns (row_number over url) so
    downstream decisions are joinable to it; a frame with neither column
    is a usage error."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if "doc_id" in docs.columns:
        return docs, False
    if "url" not in docs.columns:
        raise SystemExit(
            f"input {path} needs a doc_id or url column; got {docs.columns}"
        )
    return (
        docs.withColumn("doc_id", F.row_number().over(Window.orderBy("url"))),
        True,
    )


def _config(args) -> EngineConfig:
    kw = {}
    if getattr(args, "no_stemmer", False):
        kw["use_stemmer"] = False
    if getattr(args, "no_stopwords", False):
        kw["use_stopwords"] = False
    if getattr(args, "pagerank_weight", None) is not None:
        kw["pagerank_weight"] = args.pagerank_weight
    return DEFAULT_CONFIG.with_(**kw) if kw else DEFAULT_CONFIG


def cmd_build(spark: SparkSession, args) -> int:
    from .operators.index_build import build_index
    from .streaming.incremental import build_index_segmented

    webtext = _load_input(spark, args.input)
    if getattr(args, "latest_snapshot", False):
        from .operators.curate import latest_snapshot

        if "warc_ts" not in webtext.columns or "url" not in webtext.columns:
            raise SystemExit(
                "--latest-snapshot needs url and warc_ts columns; got "
                f"{webtext.columns}"
            )
        webtext = latest_snapshot(webtext)
    if args.segments and args.segments > 1:
        tables = build_index_segmented(
            spark, webtext, args.index, args.segments, _config(args)
        )
    else:
        tables = build_index(
            spark, webtext, args.index, _config(args), resume=args.resume
        )
    stats = tables.collection_stats(spark)
    print(
        json.dumps(
            {
                "index": args.index,
                "n_docs": int(stats["n_docs"]),
                "avgdl": float(stats["avgdl"]),
            }
        )
    )
    return 0


def cmd_query(spark: SparkSession, args) -> int:
    from .operators import query as q
    from .operators.index_build import IndexTables

    tables = IndexTables(args.index, _config(args))
    runner = {
        "bm25": q.bm25_topk,
        "wand": q.bm25_topk_wand,
        "vsm": q.vsm_topk,
        "existential": q.existential,
        "and": q.conjunctive,
    }[args.model]
    topk = runner(spark, tables, args.text, k=args.k)
    if args.start > 1 or args.end:
        topk = q.result_window(topk, args.start, args.end or args.k)
    rows = q.topk_with_docs(spark, tables, topk).collect()
    for i, r in enumerate(rows, start=args.start):
        print(f"{i}\t{r['url']}\t{r['score']:.6f}")
    return 0


def cmd_evaluate(spark: SparkSession, args) -> int:
    from .operators.evaluate import evaluate, evaluate_batch, read_judgments
    from .operators.index_build import IndexTables

    tables = IndexTables(args.index, _config(args))
    queries, judgments = read_judgments(spark, args.judgments)
    if args.model == "bm25":
        # the amortized one-plan shape (evaluate_batch is BM25-only)
        per_query, summary = evaluate_batch(
            spark, tables, queries, judgments, k=args.k
        )
    else:
        per_query, summary = evaluate(
            spark, tables, queries, judgments, model=args.model, k=args.k
        )
    for r in per_query.collect():
        print(f"qid={r['qid']}\tAP={r['avep']}\tnDCG={r['ndcg']}")
    print(json.dumps(summary))
    return 0


def cmd_curate(spark: SparkSession, args) -> int:
    from pyspark.sql import functions as F

    from .operators.curate import curation_decisions

    docs, synthetic_id = _ensure_doc_id(spark.read.parquet(args.input), args.input)
    id_col = "doc_id"
    kw = dict(
        langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
        shingle_n=args.shingle_n,
        near_dup_threshold=args.near_dup_threshold,
    )
    # ONE pipeline execution: decisions drive both outputs and both counts
    decisions = curation_decisions(docs, id_col=id_col, **kw).persist()
    try:
        if args.decisions_out:
            decisions.write.mode("overwrite").parquet(args.decisions_out)
        keep_ids = decisions.filter(F.col("keep")).select(
            F.col("doc_id").alias(id_col)
        )
        curated = docs.join(keep_ids, id_col, "left_semi")
        if synthetic_id:
            curated = curated.drop("doc_id")
        curated.write.mode("overwrite").parquet(args.out)
        counts = decisions.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
        ).head()
        print(
            json.dumps(
                {
                    "in_rows": int(counts["n"]),
                    "kept_rows": int(counts["kept"]),
                    "out": args.out,
                }
            )
        )
    finally:
        decisions.unpersist()
    return 0


def _parse_split(spec: str) -> dict:
    out = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        try:
            weight = float(w)
        except ValueError:
            weight = -1.0
        # isfinite: nan/inf parse as floats and pass a bare > 0 check, then
        # crash deep in split_column's cumulative-cut arithmetic instead of
        # failing here with a usable message
        if not name or not w or not math.isfinite(weight) or weight <= 0:
            raise SystemExit(
                f"bad --split spec {spec!r}; want name=w,name=w with finite w > 0"
            )
        out[name] = weight
    return out


def cmd_prepare(spark: SparkSession, args) -> int:
    """Raw corpus → partitioned training chunks: the whole
    decontaminate → curate → redact → cap → split → chunk composition
    (`curate.prepare_training_set`) as one command."""
    from pyspark.sql import functions as F

    from .functions.urls import url_host
    from .operators.curate import prepare_training_set, write_training_set

    raw = spark.read.parquet(args.input)
    if getattr(args, "latest_snapshot", False):
        from .operators.curate import latest_snapshot

        if "warc_ts" not in raw.columns or "url" not in raw.columns:
            raise SystemExit(
                "--latest-snapshot needs url and warc_ts columns; got "
                f"{raw.columns}"
            )
        raw = latest_snapshot(raw)
    docs, _ = _ensure_doc_id(raw, args.input)
    if "source" not in docs.columns:
        # webtext shape: the per-source diversity cap groups by host
        docs = docs.withColumn(
            "source",
            url_host(F.col("url")) if "url" in docs.columns else F.lit("all"),
        )
    eval_df = spark.read.parquet(args.eval) if args.eval else None
    chunks = prepare_training_set(
        docs,
        cap_per_source=args.cap_per_source,
        split_weights=_parse_split(args.split),
        max_len=args.max_len,
        overlap=args.overlap,
        eval_df=eval_df,
        decontaminate_n=args.decontaminate_n,
        redact=args.redact,
        clean_lines=args.clean_lines,
        boilerplate_min_docs=args.boilerplate_min_docs,
        dedup_spans_k=args.dedup_spans_k,
        langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
        shingle_n=args.shingle_n,
        near_dup_threshold=args.near_dup_threshold,
    )
    if args.token_budget is not None:
        from .functions.sampling import take_token_budget

        # the budget caps TRAIN tokens; the val split is held-out evidence
        # and stays intact. Chunk identity (doc_id, chunk_id) flattens to
        # one key column for the md5-prefix selection — membership stays a
        # pure function of the data, reproducible at any cluster size.
        if "train" not in _parse_split(args.split):
            raise SystemExit(
                "--token-budget caps the 'train' split, but --split "
                f"{args.split!r} defines no split named 'train'"
            )
        # the budget pass is 2 extra actions (histogram collect + the
        # union's branches at write): persist the chunk frame so the
        # pipeline upstream of it (contamination probe, near-dup CC)
        # computes once, not once per action
        chunks = chunks.persist()
        train = (
            chunks.filter(F.col("split") == "train")
            .withColumn(
                "__ck", F.concat_ws(":", F.col("doc_id"), F.col("chunk_id"))
            )
        )
        train = take_token_budget(
            train, args.token_budget, "n_tokens", key_col="__ck"
        ).drop("__ck")
        chunks = train.unionByName(chunks.filter(F.col("split") != "train"))
    write_training_set(chunks, args.out)
    back = spark.read.parquet(args.out)
    per_split = {
        r["split"]: {"chunks": int(r["chunks"]), "tokens": int(r["tokens"])}
        for r in back.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("chunks"),
            F.sum("n_tokens").alias("tokens"),
        )
        .collect()
    }
    print(json.dumps({"out": args.out, "splits": per_split}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="search_engine_trec_fair_ranking_19_spark")
    p.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--resume", action="store_true")
    b.add_argument(
        "--latest-snapshot",
        action="store_true",
        help="collapse a multi-crawl input to its newest warc_ts snapshot "
        "per url before anything else",
    )
    b.add_argument("--segments", type=int, default=0, help=">1 = checkpoint-resumable segmented build")
    b.add_argument("--no-stemmer", action="store_true")
    b.add_argument("--no-stopwords", action="store_true")

    qp = sub.add_parser("query", help="run one query against an index")
    qp.add_argument("--index", required=True)
    qp.add_argument("text")
    qp.add_argument(
        "--model",
        choices=["bm25", "wand", "vsm", "existential", "and"],
        default="bm25",
    )
    qp.add_argument("--k", type=int, default=10)
    qp.add_argument("--start", type=int, default=1, help="result window start, 1-based (O5)")
    qp.add_argument("--end", type=int, default=0, help="result window end")
    qp.add_argument("--pagerank-weight", type=float, default=None)
    qp.add_argument("--no-stemmer", action="store_true")
    qp.add_argument("--no-stopwords", action="store_true")

    e = sub.add_parser("evaluate", help="AP/nDCG over a judgments file")
    e.add_argument("--index", required=True)
    e.add_argument("--judgments", required=True)
    e.add_argument("--model", choices=["bm25", "vsm"], default="bm25")
    e.add_argument("--k", type=int, default=None)
    e.add_argument("--no-stemmer", action="store_true")
    e.add_argument("--no-stopwords", action="store_true")

    c = sub.add_parser("curate", help="curated corpus: lang/quality/dedup pipeline")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--decisions-out", default=None, help="also write the per-doc decision frame")
    c.add_argument("--langs", default="en")
    c.add_argument("--min-quality", type=float, default=0.35)
    c.add_argument("--shingle-n", type=int, default=3)
    c.add_argument("--near-dup-threshold", type=float, default=0.8)

    t = sub.add_parser(
        "prepare",
        help="raw corpus -> partitioned training chunks "
        "(curate/decontaminate/redact/cap/split/chunk)",
    )
    t.add_argument("--input", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--eval", default=None, help="eval/benchmark parquet to decontaminate against")
    t.add_argument("--decontaminate-n", type=int, default=13)
    t.add_argument(
        "--latest-snapshot",
        action="store_true",
        help="collapse a multi-crawl input to its newest warc_ts snapshot "
        "per url before anything else",
    )
    t.add_argument("--redact", action="store_true", help="mask emails/IPs/phones")
    t.add_argument(
        "--clean-lines",
        action="store_true",
        help="intra-document line dedup (first occurrence kept, in order)",
    )
    t.add_argument(
        "--boilerplate-min-docs",
        type=int,
        default=None,
        help="delete lines appearing in at least this many distinct docs",
    )
    t.add_argument(
        "--dedup-spans-k",
        type=int,
        default=None,
        help="delete duplicated k-token runs corpus-wide "
        "(first occurrence kept)",
    )
    t.add_argument("--cap-per-source", type=int, default=None)
    t.add_argument(
        "--token-budget",
        type=int,
        default=None,
        help="cap TRAIN tokens: keep a deterministic md5-prefix of chunks "
        "summing to at most this many tokens (val is untouched)",
    )
    t.add_argument("--split", default="train=0.9,val=0.1")
    t.add_argument("--max-len", type=int, default=512)
    t.add_argument("--overlap", type=int, default=0)
    t.add_argument("--langs", default="en")
    t.add_argument("--min-quality", type=float, default=0.35)
    t.add_argument("--shingle-n", type=int, default=3)
    t.add_argument("--near-dup-threshold", type=float, default=0.8)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name=f"themis-cli-{args.cmd}", master=args.master)
    try:
        return {
            "build": cmd_build,
            "query": cmd_query,
            "evaluate": cmd_evaluate,
            "curate": cmd_curate,
            "prepare": cmd_prepare,
        }[args.cmd](spark, args)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())

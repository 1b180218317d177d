"""Corpus-trained bigram-LM perplexity scoring for quality filtering.

The heuristic quality signals (`functions/text_analysis.py`) catch
structural garbage (punctuation walls, word salads by length stats); the
filter the large webtext pipelines actually rank by is LANGUAGE-MODEL
perplexity against an in-domain reference corpus (CCNet-style: keep the
pages a small LM finds predictable). External LMs are out of scope ("no
external data"), so this trains the reference model FROM a corpus the
caller points at — any curated high-quality subset, or the corpus itself
for self-perplexity outlier detection — and every number is a pure
function of counts, so a DuckDB oracle can recompute it exactly.

Model: interpolated bigram LM over the same lowercase word tokens the
other quality signals use.

    P(v | u) = LAMBDA * c(u,v)/c(u)  +  (1-LAMBDA) * (c(v)+ALPHA)/(T+ALPHA*V)

(maximum-likelihood bigram interpolated with an add-ALPHA unigram; unseen
continuations back off to ALPHA/(T+ALPHA*V), so every transition has
positive probability and perplexity is always finite). A document's score
is the mean negative log2 probability over its bigram transitions
(``log2_ppl``; perplexity = 2**log2_ppl) — documents with fewer than two
word tokens have no transitions and are not scored.

Scale shape (the whole point of doing this relationally):

* **fit** — one map-only bigram explode (tokens zipped with their own
  1-shift, `arrays_zip(slice, slice)`: no posexplode self-join, no window)
  into two hash aggregations with map-side partial combine; the model IS a
  pair of DataFrames (``(u, v, p_big)``, ``(v, p_uni)``) plus two scalars.
  Nothing is collected to the driver.
* **score** — the same map-only bigram explode, two LEFT equi-joins
  against the model tables (Catalyst/AQE pick broadcast when the model is
  small, shuffle-hash otherwise; at 100 TB the (u, v) join is the classic
  skew-tolerant agg-then-join), one `groupBy(doc)` average. No Python
  anywhere; every expression is whole-stage codegen.

The score join deliberately keys on (u, v) pairs rather than exploding
the model per token position: head-term skew lands on the AQE skew-join
path, and the model tables are count-sized (vocabulary², bounded by the
corpus's distinct bigrams), not corpus-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import word_tokens

LAMBDA = 0.7  # weight of the ML bigram term
ALPHA = 1.0   # add-alpha mass of the unigram backoff


@dataclass
class BigramLm:
    """A fitted bigram LM: two probability tables + the OOV floor."""

    bigram_prob: DataFrame   # (u, v, p_big = c(u,v)/c(u))
    unigram_prob: DataFrame  # (v, p_uni = (c(v)+ALPHA)/(T+ALPHA*V))
    total_tokens: int        # T
    vocab_size: int          # V

    @property
    def oov_prob(self) -> float:
        """Unigram mass of a token never seen in training."""
        return ALPHA / (self.total_tokens + ALPHA * self.vocab_size)


def _bigrams(toks) -> F.Column:
    """(u, v) structs of consecutive tokens — map-only, no window/self-join."""
    n = F.size(toks)
    return F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("u"),
        F.slice(toks, 2, n - 1).alias("v"),
    )


def fit_bigram_lm(train: DataFrame, text_col: str = "text") -> BigramLm:
    """Count unigrams + bigrams over ``train`` and derive the two
    probability tables. Two aggregation jobs (T and V ride the unigram agg
    as one scalar collect); the tables stay distributed."""
    toks = train.select(word_tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    uni = (
        toks.select(F.explode("toks").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c_v"))
    )
    totals = uni.agg(
        F.sum("c_v").alias("t"), F.count(F.lit(1)).alias("v_sz")
    ).head()
    total_tokens, vocab_size = int(totals["t"]), int(totals["v_sz"])
    bi = (
        toks.select(F.explode(_bigrams(F.col("toks"))).alias("b"))
        .select(F.col("b.u").alias("u"), F.col("b.v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c_uv"))
    )
    bigram_prob = (
        bi.join(uni.withColumnRenamed("v", "u").withColumnRenamed("c_v", "c_u"), "u")
        .select("u", "v", (F.col("c_uv") / F.col("c_u")).alias("p_big"))
    )
    denom = float(total_tokens + ALPHA * vocab_size)
    unigram_prob = uni.select(
        "v", ((F.col("c_v") + F.lit(ALPHA)) / F.lit(denom)).alias("p_uni")
    )
    return BigramLm(bigram_prob, unigram_prob, total_tokens, vocab_size)


def lm_score(
    docs: DataFrame,
    model: BigramLm,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_transitions, log2_ppl) per document with ≥ 2 word tokens.

    ``log2_ppl`` is the mean of ``-log2 P(v|u)`` over the document's
    consecutive word-token pairs; lower = more in-domain. Perplexity =
    ``2 ** log2_ppl``."""
    trans = (
        docs.select(F.col(id_col), word_tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(id_col, F.explode(_bigrams(F.col("toks"))).alias("b"))
        .select(id_col, F.col("b.u").alias("u"), F.col("b.v").alias("v"))
    )
    p = F.lit(LAMBDA) * F.coalesce(F.col("p_big"), F.lit(0.0)) + F.lit(
        1.0 - LAMBDA
    ) * F.coalesce(F.col("p_uni"), F.lit(model.oov_prob))
    return (
        trans.join(model.bigram_prob, ["u", "v"], "left")
        .join(model.unigram_prob, "v", "left")
        .select(id_col, (-F.log2(p)).alias("nll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.avg("nll").alias("log2_ppl"),
        )
    )

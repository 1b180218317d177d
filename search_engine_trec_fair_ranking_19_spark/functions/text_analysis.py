"""Text-analysis column functions for large-scale training-data pipelines.

All hot-path functions are closed-form Spark SQL expressions (JVM-side,
whole-stage codegen) so they survive 100 TB scans; only simhash/minhash
signatures (in ``dedup.py``) need Arrow UDFs. Each has an ANSI-SQL twin in
``__spark_entry__.oracle_sql`` for the DuckDB correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic (public-knowledge function words; NOT the retrieval stopword list)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
}

# word tokens: runs of letters/digits (the "BPE-ish" regex tokenizer)
WORD_REGEX = r"[A-Za-z0-9]+"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (empty tokens dropped)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def word_tokens(text: Column) -> Column:
    """Regex word tokenization, lowercased."""
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != ""
    )


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_words(text: Column) -> Column:
    return F.size(word_tokens(text))


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    lits = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lits, t)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit ratios (n-gram heuristic language ID)."""
    toks = word_tokens(text)
    n = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: (_marker_hits(toks, markers) / n).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by marker ratio; 'unk' when nothing matches.

    Deterministic tie-break: higher score wins; on ties the lexicographically
    LARGEST language code wins (struct max over (score, code))."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("s"), F.lit(lang).alias("l"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("unk"))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    toks = word_tokens(text)
    return _marker_hits(toks, LANG_MARKERS["en"]) / F.greatest(
        F.size(toks), F.lit(1)
    )


def mean_word_len(text: Column) -> Column:
    toks = word_tokens(text)
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length, punctuation, word shape.

    quality = 0.4·min(1, n_words/100) + 0.3·(1 − min(1, 4·punct_ratio))
            + 0.3·clamp01((mean_word_len − 2) / 6)
    """
    n_words = token_count_words(text)
    length_part = F.least(F.lit(1.0), n_words / F.lit(100.0))
    punct_part = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(text) * 4)
    mwl = mean_word_len(text)
    shape_part = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), (mwl - 2.0) / 6.0)
    )
    return (
        F.lit(0.4) * length_part + F.lit(0.3) * punct_part + F.lit(0.3) * shape_part
    )


def _lines(text: Column) -> Column:
    """Whitespace-stripped non-empty lines. The strip is an explicit char
    class (space/tab/CR/FF/VT), not `trim` — `trim` is space-only, which
    leaves the trailing `\\r` of every CRLF line and makes the last line
    of a page never match its duplicates; the explicit class keeps the
    Spark and DuckDB derivations byte-identical."""
    ws = r"^[ \t\r\f\x0B]+|[ \t\r\f\x0B]+$"
    return F.filter(
        F.transform(
            F.split(text, r"\n"), lambda x: F.regexp_replace(x, ws, "")
        ),
        lambda x: x != "",
    )


def _ngrams(toks: Column, n: int) -> Column:
    """ALL word n-grams in order (duplicates kept — that is the signal).

    Guarded like dedup._shingle_starts: sub-n-token docs yield an empty
    array, not a negative-step sequence."""
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def _dup_ratio(arr: Column) -> Column:
    """Fraction of elements that are repeats of an earlier element: 1 −
    distinct/total, 0 for empty arrays."""
    return F.when(F.size(arr) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(arr)) / F.size(arr)
    )


def dup_line_ratio(text: Column) -> Column:
    """Fraction of (trimmed, non-empty) lines that duplicate an earlier
    line — boilerplate nav/footer spam scores high. Linear per doc,
    closed-form JVM expressions."""
    return _dup_ratio(_lines(text))


def dup_word_ratio(text: Column) -> Column:
    """Fraction of word tokens that repeat an earlier token. Natural prose
    sits well below keyword-stuffing/spam pages."""
    return _dup_ratio(word_tokens(text))


def dup_ngram_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of word n-grams that repeat an earlier n-gram — the
    repeated-phrase signal (template farms, lyrics loops, SEO spam).
    Repetition filters over line/word/n-gram ratios are the standard
    web-corpus quality gate alongside the length/punct heuristics of
    quality_score."""
    return _dup_ratio(_ngrams(word_tokens(text), n))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text (the exact-dedup key)."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def dedup_lines(text: Column) -> Column:
    """Intra-document repetition REMOVAL (the transform the dup_*_ratio
    signals only measure): keep the FIRST occurrence of every (trimmed,
    non-empty) line, in original order, rejoined with '\\n' — the
    CCNet/Gopher-style cleanup that strips repeated nav/footer/menu lines
    a crawler pasted into the body. Whitespace-only lines are dropped
    (same `_lines` derivation as the ratios, so signal and transform agree
    on what a line is).

    Map-only: one `aggregate` fold per row accumulating the
    first-occurrence array — O(L^2) element compares for L lines per doc,
    which at web scale (L ~ 10^2) is orders cheaper than any shuffle; the
    lines array is computed once per row (no per-element recompute of the
    split, unlike a filter-with-array_position formulation)."""
    return F.array_join(
        F.aggregate(
            _lines(text),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
                F.concat(acc, F.array(x))
            ),
        ),
        "\n",
    )

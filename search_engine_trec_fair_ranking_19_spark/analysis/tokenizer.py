"""Analyzer chain: split → stopword filter → guarded Porter stem → lowercase.

Pure-Python, dependency-free functions shared by BOTH the pure-Python oracle and
the Spark engine's vectorized pandas UDFs — so token parity between the two is
by construction, and the functions are unit-testable off-Spark.

Semantics cloned from the reference:
  * build-side split on the TITLE/ABSTRACT delimiter alphabet
    (`T/.../S2TextualEntryTokens.java:55-76`, tables `:79-105`) — our webtext
    ``text`` column plays the abstract's role;
  * query-side split on the (different, smaller) query alphabet
    (`T/ui/Search.java:36,185-193`);
  * pipeline ORDER is stopword-check (on lowercased copy) → guarded Porter stem
    (on ORIGINAL case) → lowercase (`S2TextualEntryTokens.java:62-68`,
    `Search.java:229-238`). The order is rank-critical: e.g. "Apple" stems
    differently from "apple".
"""

from __future__ import annotations

from collections import Counter

from functools import lru_cache

from .delimiters import QUERY_DELIMITERS, TEXT_DELIMITERS
from .porter import stem as _porter_stem
from .stopwords import STOPWORDS

# Zipf-distributed text means a tiny distinct-token set per worker: memoizing
# the (pure) Porter stem turns the analyzer's hottest call into a dict hit.
# 2^18 entries ≈ a few MB per Python worker, far above any real per-worker
# distinct-token working set.
stem = lru_cache(maxsize=1 << 18)(_porter_stem)

# str.translate is a C-level scan — the fastest pure-Python way to apply a
# 360-char delimiter *set* (StringTokenizer semantics) before a whitespace split.
_TEXT_TRANS = str.maketrans({c: " " for c in TEXT_DELIMITERS})
_QUERY_TRANS = str.maketrans({c: " " for c in QUERY_DELIMITERS})


def split_text(text: str) -> list[str]:
    """Build-side raw split (no normalization), empty tokens dropped."""
    return text.translate(_TEXT_TRANS).split()


def split_query(query: str) -> list[str]:
    """Query-side raw split (`Search.java:185-193`)."""
    return query.translate(_QUERY_TRANS).split()


def normalize_token(
    token: str, use_stemmer: bool = True, use_stopwords: bool = True
) -> str | None:
    """Apply stopword filter → guarded stem → lowercase to one raw token.

    Returns None when the token is dropped as a stopword.
    """
    if use_stopwords and token.lower() in STOPWORDS:
        return None
    if use_stemmer:
        token = stem(token)
    return token.lower()


def analyze_text(
    text: str, use_stemmer: bool = True, use_stopwords: bool = True
) -> list[str]:
    """Full build-side analyzer: text → normalized term sequence."""
    out = []
    for tok in split_text(text):
        t = normalize_token(tok, use_stemmer, use_stopwords)
        if t is not None:
            out.append(t)
    return out


def analyze_query(
    query: str, use_stemmer: bool = True, use_stopwords: bool = True
) -> list[str]:
    """Full query-side analyzer (`Search.java:226-238`): different split set."""
    out = []
    for tok in split_query(query):
        t = normalize_token(tok, use_stemmer, use_stopwords)
        if t is not None:
            out.append(t)
    return out


def tf_map(
    text: str, use_stemmer: bool = True, use_stopwords: bool = True
) -> dict[str, int]:
    """Per-document term→TF map (`S2TextualEntryTokens.createTFMap:29-76`)."""
    return dict(Counter(analyze_text(text, use_stemmer, use_stopwords)))

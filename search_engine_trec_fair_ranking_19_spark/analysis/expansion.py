"""Query expansion — rebuild of `T/queryExpansion/` (E1-E3, SURVEY.md §2.10).

The reference ships two expanders backed by external artifacts:
  * GloVe nearest-neighbour (`T/queryExpansion/model/GloVe.java:52-80`):
    3 nearest terms per query token via dl4j ``wordsNearest``;
  * WordNet synsets (`T/queryExpansion/model/WordNet.java:52-105`):
    POS-tagged synonym lookup via extjwnl.

Those model files are external data (not available here, and out of scope per
the build rules), so the *models* are stubs gated behind import/availability
checks — but the expansion **pipeline semantics** (`Search.java:241-269`, E3)
are fully implemented and tested against a deterministic table-driven
expander:

  * every candidate list is generated per ORIGINAL query token (pre-
    normalization — the reference expands raw tokens, `Search.java:243`);
  * expansion terms containing whitespace are dropped (`Search.java:248-253`);
  * at most ``max_per_term`` (=2) expansions are kept per original token
    (`Search.java:255-258`);
  * an expansion equal (post-normalization) to an already-emitted term is
    dropped (`Search.java:259-266`);
  * originals carry weight 1.0, expansions ``expansion_weight`` (=0.5)
    (`GloVe.java:67`, `Search.java:262`);
  * the normalize chain (stopword → guarded stem → lowercase) applies to
    expansions exactly as to originals (`Search.java:229-238` reused).

Expansion is driver-side work on a handful of tokens — it never touches the
distributed plan (the expanded (term, weight) list feeds the same broadcast
query DataFrame).
"""

from __future__ import annotations

from typing import Protocol

from .tokenizer import normalize_token, split_query

EXPANSION_WEIGHT = 0.5  # GloVe.java:67
MAX_EXPANSIONS_PER_TERM = 2  # Search.java:255-258


class QueryExpander(Protocol):
    """Per-token candidate generator. Implementations must be deterministic."""

    def expand(self, token: str) -> list[str]:  # pragma: no cover - protocol
        ...


class SynonymTableExpander:
    """Deterministic table-driven expander (the test/production stand-in for
    GloVe/WordNet: a user-supplied synonym table, e.g. mined from the corpus —
    no external artifacts)."""

    def __init__(self, table: dict[str, list[str]]):
        self.table = {k.lower(): list(v) for k, v in table.items()}

    def expand(self, token: str) -> list[str]:
        return list(self.table.get(token.lower(), []))


class GloVeExpander:
    """STUB — requires an external GloVe model (`GloVe.java:31-44` loads
    ``glove.6B.300d.txt`` via dl4j). Not available in this environment."""

    def __init__(self, model_path: str | None = None):
        raise NotImplementedError(
            "GloVe expansion needs an external embeddings file; supply a "
            "SynonymTableExpander built from corpus statistics instead"
        )


class WordNetExpander:
    """STUB — requires the external WordNet DB + POS tagger
    (`WordNet.java:38-50`). Not available in this environment."""

    def __init__(self, wordnet_path: str | None = None):
        raise NotImplementedError(
            "WordNet expansion needs the external WordNet database; supply a "
            "SynonymTableExpander instead"
        )


def expand_query(
    query: str,
    expander: QueryExpander | None,
    use_stemmer: bool = True,
    use_stopwords: bool = True,
) -> list[tuple[str, float]]:
    """query string → [(normalized term, weight)] with E3 filter semantics.

    With ``expander=None`` this reduces exactly to the unexpanded analyzer
    (every term weight 1.0). Duplicate merged terms are NOT collapsed here —
    `merge_terms` (A9) does that downstream, matching the reference order of
    operations (`Retrieval.mergeTerms` runs inside the model)."""
    out: list[tuple[str, float]] = []
    seen: set[str] = set()
    for raw in split_query(query):
        norm = normalize_token(raw, use_stemmer, use_stopwords)
        if norm is not None:
            out.append((norm, 1.0))
            seen.add(norm)
        if expander is None:
            continue
        kept = 0
        for cand in expander.expand(raw):
            if kept >= MAX_EXPANSIONS_PER_TERM:
                break
            if any(c.isspace() for c in cand):  # multiword dropped
                continue
            cnorm = normalize_token(cand, use_stemmer, use_stopwords)
            if cnorm is None or cnorm in seen:
                continue
            out.append((cnorm, EXPANSION_WEIGHT))
            seen.add(cnorm)
            kept += 1
    return out

"""WordNet query expansion — real E2 semantics (SURVEY.md §2.10).

Rebuilds `T/queryExpansion/model/WordNet.java:52-105`:

  1. the query is POS-tagged (reference: Stanford left3words Maxent tagger,
     `WordNet.java:33,68`); Penn tags map to the four WordNet POS classes
     via the exact switch in `WordNet.java:113-137` (anything else → null);
  2. a null-POS token keeps its original term with NO expansions
     (`WordNet.java:81-99`);
  3. for a tagged token, `Dictionary.getIndexWord(pos, term)` resolves the
     lemma in THAT POS only, and for **each** of its synsets (sense order as
     stored in the index) up to ``EXTRA_TERMS_PER_SYNSET`` (=3) non-stopword
     member lemmas are emitted at weight 0.5 (`WordNet.java:85-97` — the
     per-synset counter resets every synset, counts only emitted words, and
     the original lemma is NOT skipped: it usually re-appears as the first
     word of each synset and is deduped only by the downstream E3
     last-emitted-term rule);
  4. multiword lemmas surface with SPACES (extjwnl's ``Word.getLemma()``
     maps the database's underscores back to spaces) and are then dropped by
     E3's multiword filter (`Search.java:250-253`) — replicated here by
     underscore→space conversion, leaving the drop to ``expand_query``.

The two external artifacts are handled differently:

  * the **WordNet database** is read directly in its public `wndb(5)` file
    format (``index.{noun,verb,adj,adv}`` + ``data.{...}``) from any
    standard WordNet 3.x ``dict/`` directory the user points at — no
    extjwnl needed. Tests exercise the parser against a synthetic
    mini-database written in the same format.
  * the **Maxent tagger model** is not redistributable; ``RuleTagger`` is a
    deterministic public-knowledge stand-in (closed-class word list + the
    classic suffix-guesser backoff used by rule-based taggers since Brill's).
    Any callable ``list[str] -> list[str]`` of Penn tags can be injected for
    exact-parity setups.
"""

from __future__ import annotations

import os
from typing import Callable

from .stopwords import STOPWORDS

EXPANSION_WEIGHT = 0.5  # WordNet.java:56
EXTRA_TERMS_PER_SYNSET = 3  # WordNet.java:58 ("extraTerms")

# WordNet.java:113-137, verbatim
PENN_TO_WN = {
    "NN": "n", "NNS": "n", "NNP": "n", "NNPS": "n",
    "VB": "v", "VBD": "v", "VBG": "v", "VBN": "v", "VBP": "v", "VBZ": "v",
    "JJ": "a", "JJR": "a", "JJS": "a",
    "RB": "r", "RBR": "r", "RBS": "r",
}

_POS_FILES = {"n": "noun", "v": "verb", "a": "adj", "r": "adv"}

# Adjective lemmas may carry a syntactic-position marker suffix in the data
# files — extjwnl strips it from getLemma(); wndb(5) §"Word" lists exactly
# these three.
_ADJ_MARKERS = ("(p)", "(a)", "(ip)")


class WordNetDictionary:
    """Reader for the public WordNet database file format (`wndb(5)`).

    Parses ``index.<pos>`` into lemma → ordered synset offsets (sense order,
    which `IndexWord.getSenses()` preserves) and ``data.<pos>`` into
    offset → member lemmas (synset word order). Loads each POS lazily and
    keeps it in memory — the full WN 3.0 dict is ~16 MB of text, trivially
    driver-resident, and expansion is driver-side work on a handful of query
    tokens (the expanded list feeds the same broadcast query DataFrame).
    """

    def __init__(self, dict_dir: str):
        if not os.path.isdir(dict_dir):
            raise FileNotFoundError(
                f"WordNet dict directory not found: {dict_dir!r} — point at "
                "a standard WordNet 3.x dict/ (index.noun, data.noun, ...)"
            )
        self.dict_dir = dict_dir
        self._index: dict[str, dict[str, list[int]]] = {}
        self._data: dict[str, dict[int, list[str]]] = {}

    # -- wndb(5) parsing -----------------------------------------------------

    def _load_pos(self, pos: str) -> None:
        if pos in self._index:
            return
        name = _POS_FILES[pos]
        index: dict[str, list[int]] = {}
        with open(os.path.join(self.dict_dir, f"index.{name}")) as f:
            for line in f:
                if line.startswith(" "):  # license header lines
                    continue
                # lemma pos synset_cnt p_cnt [ptr...] sense_cnt tagsense_cnt
                # synset_offset...
                parts = line.split()
                if len(parts) < 6:
                    continue
                lemma, _pos, synset_cnt, p_cnt = (
                    parts[0], parts[1], int(parts[2]), int(parts[3]),
                )
                offsets = parts[4 + p_cnt + 2:]
                index[lemma] = [int(o) for o in offsets[:synset_cnt]]
        data: dict[int, list[str]] = {}
        with open(os.path.join(self.dict_dir, f"data.{name}")) as f:
            for line in f:
                if line.startswith(" "):
                    continue
                # synset_offset lex_filenum ss_type w_cnt (word lex_id)...
                parts = line.split()
                if len(parts) < 5:
                    continue
                offset = int(parts[0])
                w_cnt = int(parts[3], 16)  # 2-digit hex per wndb(5)
                words = []
                for i in range(w_cnt):
                    w = parts[4 + 2 * i]
                    for m in _ADJ_MARKERS:
                        if w.endswith(m):
                            w = w[: -len(m)]
                    words.append(w.replace("_", " "))  # extjwnl getLemma()
                data[offset] = words
        self._index[pos] = index
        self._data[pos] = data

    # -- extjwnl-shaped lookups ----------------------------------------------

    def get_index_word(self, pos: str, term: str) -> list[int] | None:
        """`Dictionary.getIndexWord(pos, term)` → ordered synset offsets, or
        None when the lemma has no entry in that POS."""
        self._load_pos(pos)
        return self._index[pos].get(term.lower().replace(" ", "_"))

    def synset_words(self, pos: str, offset: int) -> list[str]:
        """`Synset.getWords()` lemmas in synset order, spaces restored."""
        self._load_pos(pos)
        return self._data[pos].get(offset, [])


# Closed-class (function-word) Penn tags — these tokens never reach WordNet
# in the reference because getPos() maps their tags to null.
_CLOSED_CLASS = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "these": "DT", "those": "DT",
    "he": "PRP", "she": "PRP", "it": "PRP", "they": "PRP", "we": "PRP",
    "i": "PRP", "you": "PRP", "him": "PRP", "her": "PRP", "them": "PRP",
    "his": "PRP$", "their": "PRP$", "its": "PRP$", "our": "PRP$",
    "my": "PRP$", "your": "PRP$",
    "in": "IN", "of": "IN", "on": "IN", "at": "IN", "by": "IN",
    "for": "IN", "with": "IN", "from": "IN", "into": "IN", "over": "IN",
    "under": "IN", "between": "IN", "through": "IN", "during": "IN",
    "about": "IN", "against": "IN", "as": "IN", "if": "IN", "than": "IN",
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC",
    "to": "TO",
    "can": "MD", "could": "MD", "will": "MD", "would": "MD", "may": "MD",
    "might": "MD", "must": "MD", "shall": "MD", "should": "MD",
    "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "be": "VB",
    "been": "VBN", "being": "VBG", "am": "VBP",
    "not": "RB", "very": "RB", "too": "RB", "also": "RB",
}


def rule_tag(tokens: list[str]) -> list[str]:
    """Deterministic Penn-tag stand-in for the reference's Maxent tagger
    (`WordNet.java:33`: english-left3words — an external model file).

    Rules (the standard suffix-guesser backoff, public knowledge): known
    closed-class words from the table above; numbers → CD; -ly → RB;
    -ing → VBG; -ed → VBD; -ous/-ful/-ive/-able/-ible/-al/-ic → JJ;
    -s (non -ss) → NNS; everything else → NN. Nouns dominate open-class
    query vocabulary, so NN is the right default for retrieval queries."""
    tags = []
    for tok in tokens:
        low = tok.lower()
        if low in _CLOSED_CLASS:
            tags.append(_CLOSED_CLASS[low])
        elif any(c.isdigit() for c in tok):
            tags.append("CD")
        elif not tok.isalpha():
            tags.append("SYM")
        elif low.endswith("ly") and len(low) > 4:
            tags.append("RB")
        elif low.endswith("ing") and len(low) > 5:
            tags.append("VBG")
        elif low.endswith("ed") and len(low) > 4:
            tags.append("VBD")
        elif low.endswith(
            ("ous", "ful", "ive", "able", "ible", "al", "ic")
        ) and len(low) > 4:
            tags.append("JJ")
        elif low.endswith("s") and not low.endswith("ss") and len(low) > 3:
            tags.append("NNS")
        else:
            tags.append("NN")
    return tags


class WordNetExpander:
    """E2 expander with the reference's exact candidate semantics
    (`WordNet.java:75-99`); plugs into ``expand_query`` (E3) like any other
    ``QueryExpander``.

    ``tagger`` maps a token list to Penn tags (default: ``rule_tag``).
    Tagging is per-call over the single token — the reference tags the whole
    query string at once, but its left3words context only disambiguates
    tags we approximate anyway, and injection restores exact parity.
    """

    def __init__(
        self,
        dict_dir: str,
        tagger: Callable[[list[str]], list[str]] = rule_tag,
        use_stopwords: bool = True,
    ):
        self.dictionary = WordNetDictionary(dict_dir)
        self.tagger = tagger
        self.use_stopwords = use_stopwords

    def expand(self, token: str) -> list[str]:
        pos = PENN_TO_WN.get(self.tagger([token])[0])
        if pos is None:  # WordNet.java:81: null POS → no expansion
            return []
        offsets = self.dictionary.get_index_word(pos, token)
        if offsets is None:  # WordNet.java:83: no index word → no expansion
            return []
        out: list[str] = []
        for off in offsets:  # sense order (WordNet.java:85)
            word_count = 0  # resets per synset (WordNet.java:87)
            for lemma in self.dictionary.synset_words(pos, off):
                # stopword lemmas skipped BEFORE counting (WordNet.java:90-92)
                if self.use_stopwords and lemma.lower() in STOPWORDS:
                    continue
                out.append(lemma)
                word_count += 1
                if word_count == EXTRA_TERMS_PER_SYNSET:
                    break  # WordNet.java:94-96
        return out

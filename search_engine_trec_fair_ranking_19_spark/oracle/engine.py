"""Pure-Python oracle of the reference engine's semantics (no Spark, no numpy).

A tiny, direct reimplementation of Themis' indexing + retrieval pipeline over
in-memory lists, used as the correctness anchor: the Spark engine must be
rank-identical (top-k docids) and score-identical (≤1e-9 after normalization)
to this oracle on the synthetic corpus.

Faithful to:
  * analyzer chain           — shared code in ``..analysis`` (parity by construction)
  * docid assignment         — ascending ``url`` order (rebuild policy for
                               `Indexer.java:96-97,172,725-740` parse-order ids)
  * BM25+ scoring            — `T/retrieval/models/OkapiBM25P.java:36-106`
  * VSM scoring              — `T/retrieval/models/VSM.java:33-129` + index-time
                               norm `Indexer.updateVSMWeights:570-623`
  * Existential              — `T/retrieval/models/Existential.java:28-59`
  * mergeTerms               — `T/retrieval/models/Retrieval.java:151-173`
  * pagerank blend + sorting — `Retrieval.sort:71-116` (stable desc sort over an
                               ascending-docid list ⇒ ties break ascending docid)
  * PageRank                 — `T/linkAnalysis/Pagerank.java:156-277` (Jacobi
                               iteration, sink-mass redistribution, cleaned edges)
  * AP / nDCG                — `T/metrics/ThemisEval.java:207-271`
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..analysis.expansion import expand_query
from ..analysis.tokenizer import analyze_query, tf_map
from ..config import DEFAULT_CONFIG, EngineConfig


@dataclass
class OracleIndex:
    config: EngineConfig
    urls: list[str]                                  # docid -> url (docid = position+1)
    doc_id_of_url: dict[str, int]
    postings: dict[str, list[tuple[int, int]]]       # term -> [(docid, tf)] asc docid
    df: dict[str, int]
    token_count: dict[int, int]                      # docid -> dl (post-stopword)
    max_tf: dict[int, int]
    vsm_weight: dict[int, float]
    n_docs: int
    avgdl: float
    pagerank: dict[int, float] = field(default_factory=dict)


def build_index(
    docs: list[tuple[str, str]],
    config: EngineConfig = DEFAULT_CONFIG,
    out_links: dict[str, list[str]] | None = None,
) -> OracleIndex:
    """Index a list of (url, text). docids = 1-based rank of url ascending."""
    urls = sorted(url for url, _ in docs)
    doc_id_of_url = {u: i + 1 for i, u in enumerate(urls)}
    text_of_url = dict(docs)

    postings: dict[str, list[tuple[int, int]]] = {}
    token_count: dict[int, int] = {}
    max_tf: dict[int, int] = {}
    for url in urls:
        docid = doc_id_of_url[url]
        tfs = tf_map(text_of_url[url], config.use_stemmer, config.use_stopwords)
        token_count[docid] = sum(tfs.values())
        max_tf[docid] = max(tfs.values(), default=0)
        for term, tf in tfs.items():
            postings.setdefault(term, []).append((docid, tf))
    for plist in postings.values():
        plist.sort()  # ascending docid

    df = {t: len(p) for t, p in postings.items()}
    n_docs = len(urls)
    total_tokens = sum(token_count.values())
    avgdl = total_tokens / n_docs if n_docs else 0.0

    # index-time VSM norm (Indexer.updateVSMWeights:570-623): idf = ln(N/DF)
    vsm_weight: dict[int, float] = {d: 0.0 for d in token_count}
    for term, plist in postings.items():
        idf = math.log(n_docs / df[term])
        for docid, tf in plist:
            vsm_weight[docid] += (tf * idf) ** 2
    for docid in vsm_weight:
        mtf = max_tf[docid]
        vsm_weight[docid] = math.sqrt(vsm_weight[docid]) / mtf if mtf else 0.0

    index = OracleIndex(
        config=config,
        urls=urls,
        doc_id_of_url=doc_id_of_url,
        postings=postings,
        df=df,
        token_count=token_count,
        max_tf=max_tf,
        vsm_weight=vsm_weight,
        n_docs=n_docs,
        avgdl=avgdl,
    )
    if out_links is not None:
        index.pagerank = pagerank(index, out_links)
    return index


# ---------------------------------------------------------------------------
# query side
# ---------------------------------------------------------------------------

def merge_terms(terms: list[tuple[str, float]]) -> list[tuple[str, float]]:
    """First-occurrence order, duplicate weights summed (Retrieval.java:151-173)."""
    merged: list[tuple[str, float]] = []
    seen: dict[str, int] = {}
    for term, w in terms:
        if term in seen:
            i = seen[term]
            merged[i] = (term, merged[i][1] + w)
        else:
            seen[term] = len(merged)
            merged.append((term, w))
    return merged


def _finalize(
    index: OracleIndex,
    scores: dict[int, float],
    k: int | None,
    pagerank_weight: float,
) -> list[tuple[int, float]]:
    """Pagerank blend + stable desc sort + truncate (Retrieval.sort:71-116)."""
    results = sorted(scores.items())  # ascending docid, as the reference builds them
    if pagerank_weight != 0.0 and results:
        max_pr = max(index.pagerank.get(d, 0.0) for d, _ in results)
        if max_pr == 0.0:
            max_pr = 1.0
        mw = 1.0 - pagerank_weight
        results = [
            (d, s * mw + (index.pagerank.get(d, 0.0) / max_pr) * pagerank_weight)
            for d, s in results
        ]
    results.sort(key=lambda r: -r[1])  # stable ⇒ ties stay ascending docid
    return results if k is None else results[: min(k, len(results))]


def bm25_topk(
    index: OracleIndex,
    query: str,
    k: int | None = None,
    pagerank_weight: float | None = None,
    expander=None,
) -> list[tuple[int, float]]:
    """Okapi BM25+ (OkapiBM25P.java:36-106). Returns [(docid, score)].

    Key semantics: every doc matching ≥1 query term receives, for EVERY query
    term j, the additive ``idf_j`` (the BM25+ δ=1 term) — so the score is
    ``Σ_j idf_j * (f_j*(k1+1)/(f_j+B) + 1)`` with f_j = 0 for unmatched terms.
    """
    cfg = index.config
    if pagerank_weight is None:
        pagerank_weight = cfg.pagerank_weight
    k1, b = cfg.bm25_k1, cfg.bm25_b
    terms = merge_terms(
        expand_query(query, expander, cfg.use_stemmer, cfg.use_stopwords)
    )
    if not terms:
        return []
    dfs = [index.df.get(t, 0) for t, _ in terms]
    idfs = [math.log(index.n_docs / (1.0 + df)) for df in dfs]
    sum_idf = sum(idfs)

    # accumulate matched-term contributions per doc
    freqs: dict[int, dict[int, float]] = {}
    for j, (term, weight) in enumerate(terms):
        for docid, tf in index.postings.get(term, []):
            freqs.setdefault(docid, {})[j] = tf * weight

    scores: dict[int, float] = {}
    max_score = 0.0
    for docid, fmap in freqs.items():
        B = k1 * (1 - b + (b * index.token_count[docid]) / index.avgdl)
        score = sum_idf
        for j, f in fmap.items():
            score += idfs[j] * (f * (k1 + 1) / (f + B))
        scores[docid] = score
        max_score = max(max_score, score)
    if max_score == 0.0:
        max_score = 1.0
    for docid in scores:
        scores[docid] /= max_score
    return _finalize(index, scores, k, pagerank_weight)


def vsm_topk(
    index: OracleIndex,
    query: str,
    k: int | None = None,
    pagerank_weight: float | None = None,
    expander=None,
) -> list[tuple[int, float]]:
    """VSM (VSM.java:33-129). Query idf is ln(N/(1+DF)); index-time norm uses
    ln(N/DF) — the reference's (intentional-looking) inconsistency, replicated."""
    cfg = index.config
    if pagerank_weight is None:
        pagerank_weight = cfg.pagerank_weight
    terms = merge_terms(
        expand_query(query, expander, cfg.use_stemmer, cfg.use_stopwords)
    )
    if not terms:
        return []
    max_q_freq = max(w for _, w in terms)
    dfs = [index.df.get(t, 0) for t, _ in terms]
    idfs = [math.log(index.n_docs / (1.0 + df)) for df in dfs]
    q_weights = [(w / max_q_freq) * idfs[j] for j, (_, w) in enumerate(terms)]
    q_norm = math.sqrt(sum(w * w for w in q_weights))

    doc_w: dict[int, dict[int, float]] = {}
    for j, (term, weight) in enumerate(terms):
        for docid, tf in index.postings.get(term, []):
            d = doc_w.setdefault(docid, {})
            d[j] = d.get(j, 0.0) + (tf * weight / index.max_tf[docid]) * idfs[j]

    scores: dict[int, float] = {}
    max_score = 0.0
    for docid, wmap in doc_w.items():
        dot = sum(q_weights[j] * w for j, w in wmap.items())
        s = dot / (index.vsm_weight[docid] * q_norm)
        scores[docid] = s
        max_score = max(max_score, s)
    if max_score == 0.0:
        max_score = 1.0
    for docid in scores:
        scores[docid] /= max_score
    return _finalize(index, scores, k, pagerank_weight)


def existential(index: OracleIndex, query: str, k: int | None = None) -> list[tuple[int, float]]:
    """Docs containing ≥1 query term, score ≡ 1.0 (Existential.java:28-59)."""
    cfg = index.config
    terms = merge_terms(
        [(t, 1.0) for t in analyze_query(query, cfg.use_stemmer, cfg.use_stopwords)]
    )
    docids = sorted({d for t, _ in terms for d, _ in index.postings.get(t, [])})
    scores = {d: 1.0 for d in docids}
    return _finalize(index, scores, k, 0.0)


def conjunctive(index: OracleIndex, query: str, k: int | None = None) -> list[tuple[int, float]]:
    """Boolean AND (our extension — the reference implements only the OR half,
    `Existential.java:14-18`): docs containing EVERY distinct query term,
    score ≡ 1.0. An OOV term makes the intersection empty."""
    cfg = index.config
    terms = merge_terms(
        [(t, 1.0) for t in analyze_query(query, cfg.use_stemmer, cfg.use_stopwords)]
    )
    if not terms:
        return []
    sets = [{d for d, _ in index.postings.get(t, [])} for t, _ in terms]
    docids = set.intersection(*sets) if sets else set()
    scores = {d: 1.0 for d in docids}
    return _finalize(index, scores, k, 0.0)


# ---------------------------------------------------------------------------
# PageRank (Pagerank.java:156-277)
# ---------------------------------------------------------------------------

def clean_out_links(
    url: str, links: list[str], doc_id_of_url: dict[str, int]
) -> list[str]:
    """Per-source cleaning (skipCitation, Pagerank.java:156-178): drop targets
    not in the collection, self-loops, and duplicates (keep first)."""
    out, seen = [], set()
    for tgt in links:
        if tgt not in doc_id_of_url or tgt == url or tgt in seen:
            continue
        seen.add(tgt)
        out.append(tgt)
    return out


def pagerank(
    index: OracleIndex, out_links: dict[str, list[str]]
) -> dict[int, float]:
    """Jacobi power iteration with sink-mass redistribution
    (Pagerank.computeCitationsPagerank:214-277)."""
    cfg = index.config
    n = index.n_docs
    d = cfg.pagerank_damping
    eps = cfg.pagerank_threshold
    teleport = (1 - d) / n

    out_deg: dict[int, int] = {i: 0 for i in range(1, n + 1)}
    in_edges: dict[int, list[int]] = {i: [] for i in range(1, n + 1)}
    for url, links in out_links.items():
        if url not in index.doc_id_of_url:
            continue
        src = index.doc_id_of_url[url]
        cleaned = clean_out_links(url, links, index.doc_id_of_url)
        out_deg[src] = len(cleaned)
        for tgt in cleaned:
            in_edges[index.doc_id_of_url[tgt]].append(src)

    score = {i: 1.0 / n for i in range(1, n + 1)}
    for _ in range(cfg.pagerank_max_iters):
        sink_mass = sum(s for i, s in score.items() if out_deg[i] == 0)
        sink_share = sink_mass / n
        new_score = {}
        for i in range(1, n + 1):
            s = sink_share + sum(score[j] / out_deg[j] for j in in_edges[i])
            new_score[i] = s * d + teleport
        converged = all(abs(new_score[i] - score[i]) <= eps for i in score)
        score = new_score
        if converged:
            break
    return score


# ---------------------------------------------------------------------------
# evaluation (ThemisEval.java:207-271)
# ---------------------------------------------------------------------------

def average_precision(
    ranked_urls: list[str], relevance: dict[str, int]
) -> float:
    """AP over judged docs only; NaN when the query has no relevant docs."""
    total_relevant = sum(1 for r in relevance.values() if r == 1)
    if total_relevant == 0:
        return float("nan")
    avep, found, judged = 0.0, 0, 0
    for url in ranked_urls:
        rel = relevance.get(url)
        if rel is None:
            continue
        judged += 1
        if rel == 1:
            found += 1
            avep += found / judged
    return avep / total_relevant


def ndcg(ranked_urls: list[str], relevance: dict[str, int]) -> float:
    """Binary nDCG with the reference's ln2/ln(rank+1) gains over judged docs."""
    total_relevant = sum(1 for r in relevance.values() if r == 1)
    if total_relevant == 0:
        return float("nan")
    dcg, judged = 0.0, 0
    for url in ranked_urls:
        rel = relevance.get(url)
        if rel is None:
            continue
        judged += 1
        if rel == 1:
            dcg += math.log(2) / math.log(judged + 1)
    idcg = sum(math.log(2) / math.log(i + 1) for i in range(1, total_relevant + 1))
    return dcg / idcg

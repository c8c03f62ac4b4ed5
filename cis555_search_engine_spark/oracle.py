"""Pure-Python reference indexer + scorers — the correctness oracle.

The reference has no machine-readable tests (SURVEY.md §5), so this module
*is* the constructed oracle: it re-implements, in plain Python over plain
dicts, exactly the semantics the Spark engine must match —

- tokenizer: ``functions.tokenizer.tokenize_py`` (shared module),
- stemming: ``functions.porter.porter_stem`` (shared module),
- reference tf-idf ranker (frontend/SearchHelper.java:138-185):
    tf_norm = (1 + ln(count)) / (1 + ln(max_count))        [report p.2]
    idf_ref = ln(total_posting_rows / df)                  [report p.3]
    weight  = tf_norm * idf_ref
    match terms = {stem(k)} ∪ {k} for each query keyword   [:140-141]
    score(doc) = Σ weight(t, doc) (+ 0.5 * prior)          [:157]
    top-k by score DESC, tie-break (conv_id, turn_idx) ASC
- BM25 ranker (primary, north rule): k1=1.2, b=0.75,
    idf_bm25 = ln((N - df + 0.5) / (df + 0.5) + 1), N = #docs
    score = Σ idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen))

Tests assert the Spark engine is rank-identical (doc ids AND scores) to
this oracle on the reference query set over the synthetic corpus.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from .functions.porter import porter_stem
from .functions.tokenizer import tokenize_py

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    # (conv_id, turn_idx) -> {term: tf}
    doc_tf: dict[tuple[str, int], Counter] = field(default_factory=dict)
    # (conv_id, turn_idx) -> {term: [positions]}
    doc_pos: dict[tuple[str, int], dict[str, list[int]]] = field(default_factory=dict)
    doc_len: dict[tuple[str, int], int] = field(default_factory=dict)
    max_tf: dict[tuple[str, int], int] = field(default_factory=dict)
    df: Counter = field(default_factory=Counter)
    n_docs: int = 0
    n_postings: int = 0  # total (term, doc) rows — reference's idf N (quirk, SURVEY §1.1)


def build_index(docs: list[tuple[str, int, str]]) -> OracleIndex:
    """docs = [(conv_id, turn_idx, text)]; stems every token."""
    idx = OracleIndex()
    for conv_id, turn_idx, text in docs:
        key = (conv_id, turn_idx)
        toks = [porter_stem(t) for t in tokenize_py(text)]
        tf = Counter(toks)
        pos: dict[str, list[int]] = {}
        for p, t in enumerate(toks):
            pos.setdefault(t, []).append(p)
        idx.doc_tf[key] = tf
        idx.doc_pos[key] = pos
        idx.doc_len[key] = len(toks)
        idx.max_tf[key] = max(tf.values()) if tf else 0
        for t in tf:
            idx.df[t] += 1
        idx.n_docs += 1
        idx.n_postings += len(tf)
    return idx


def query_terms(query: str) -> list[str]:
    """Reference semantics: both the stemmed AND raw form of each keyword
    (SearchHelper.java:138-144), deduplicated, order-preserving. Queries
    pass through the document tokenizer (sanitizer analog, XPathApp.java:42-51)."""
    seen: dict[str, None] = {}
    for kw in tokenize_py(query):
        for t in (porter_stem(kw), kw):
            seen.setdefault(t, None)
    return list(seen)


def score_tfidf_ref(
    idx: OracleIndex,
    query: str,
    k: int = 80,
    prior: dict[tuple[str, int], float] | None = None,
) -> list[tuple[str, int, float]]:
    """Reference ranker: Σ tf-idf weight (+ 0.5*prior), top-k."""
    terms = query_terms(query)
    scores: dict[tuple[str, int], float] = {}
    for t in terms:
        dfreq = idx.df.get(t)
        if not dfreq:
            continue
        idf = math.log(idx.n_postings / dfreq)
        for key, tf in idx.doc_tf.items():
            c = tf.get(t)
            if c:
                w = (1.0 + math.log(c)) / (1.0 + math.log(idx.max_tf[key])) * idf
                scores[key] = scores.get(key, 0.0) + w
    if prior:
        for key in list(scores):
            scores[key] += 0.5 * prior.get(key, 0.0)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


def score_cosine_ref(
    idx: OracleIndex, query: str, k: int = 40
) -> list[tuple[str, int, float]]:
    """Reference cosine ranker (SearchHelperYezheng.java:226-252):
    score = Σ(w·idf) / sqrt(Σ w²) over matching terms."""
    terms = query_terms(query)
    inner: dict[tuple[str, int], float] = {}
    sumsq: dict[tuple[str, int], float] = {}
    for t in terms:
        dfreq = idx.df.get(t)
        if not dfreq:
            continue
        idf = math.log(idx.n_postings / dfreq)
        for key, tf in idx.doc_tf.items():
            c = tf.get(t)
            if c:
                w = (1.0 + math.log(c)) / (1.0 + math.log(idx.max_tf[key])) * idf
                inner[key] = inner.get(key, 0.0) + w * idf
                sumsq[key] = sumsq.get(key, 0.0) + w * w
    scores = {key: inner[key] / math.sqrt(sumsq[key]) for key in inner}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


def score_bm25(
    idx: OracleIndex, query: str, k: int = 80
) -> list[tuple[str, int, float]]:
    """BM25 top-k (stemmed query terms only — BM25 is the new primary
    ranker; the stem∪raw union quirk stays in the parity ranker)."""
    terms = list(dict.fromkeys(porter_stem(t) for t in tokenize_py(query)))
    n = idx.n_docs
    avglen = sum(idx.doc_len.values()) / n if n else 0.0
    scores: dict[tuple[str, int], float] = {}
    for t in terms:
        dfreq = idx.df.get(t)
        if not dfreq:
            continue
        idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        for key, tf in idx.doc_tf.items():
            c = tf.get(t)
            if c:
                dl = idx.doc_len[key]
                s = idf * c * (K1 + 1.0) / (c + K1 * (1.0 - B + B * dl / avglen))
                scores[key] = scores.get(key, 0.0) + s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


def score_lm_dirichlet(
    idx: OracleIndex, query: str, k: int = 80, mu: float = 2000.0
) -> list[tuple[str, int, float]]:
    """Dirichlet-smoothed query likelihood (Zhai & Lafferty, SIGIR 2001),
    decomposed posting-driven form — the pure-Python twin of
    operators.scoring.lm_dirichlet_topk:

        score(q,d) = Σ_{t∈q∩d} ln(1 + tf·T/(μ·cf_t)) + |q|·ln(μ/(len_d+μ))

    Stemmed deduplicated query terms (same contract as score_bm25);
    only docs matching ≥1 query term are ranked.
    """
    terms = list(dict.fromkeys(porter_stem(t) for t in tokenize_py(query)))
    n = idx.n_docs
    avglen = sum(idx.doc_len.values()) / n if n else 0.0
    total_tokens = float(n) * avglen
    cf = {
        t: sum(tf.get(t, 0) for tf in idx.doc_tf.values())
        for t in terms
    }
    scores: dict[tuple[str, int], float] = {}
    for t in terms:
        c_t = cf.get(t)
        if not c_t:
            continue
        for key, tf in idx.doc_tf.items():
            c = tf.get(t)
            if c:
                s = math.log(1.0 + c * total_tokens / (mu * c_t))
                scores[key] = scores.get(key, 0.0) + s
    nq = float(len(terms))
    for key in list(scores):
        scores[key] += nq * math.log(mu / (idx.doc_len[key] + mu))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


def score_rm3(
    idx: OracleIndex,
    query: str,
    k: int = 80,
    fb_docs: int = 10,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
) -> list[tuple[str, int, float]]:
    """RM3 pseudo-relevance feedback (Lavrenko & Croft SIGIR'01;
    interpolation per Abdul-Jaleel et al. TREC'04) — the pure-Python
    twin of operators.scoring.rm3_topk:

    1. BM25 first pass; top ``fb_docs`` by (round(score,4) DESC, key
       ASC) are the pseudo-relevant set (rounded cutoff = the engine's
       reproducible tie-break).
    2. P(w|R) = Σ_d tf(w,d)/len_d · s_d/Σs, rounded to 6dp; top
       ``fb_terms`` by (P DESC, term ASC), renormalized, interpolated
       with the uniform query model at ``orig_weight``.
    3. Weighted BM25 second pass: score(d) = Σ_w w(t)·bm25(t,d).
    """
    terms = list(dict.fromkeys(porter_stem(t) for t in tokenize_py(query)))
    if not terms:
        return []
    fb_all = [
        (key, round(s, 4))
        for c, t, s in score_bm25(idx, query, k=idx.n_docs)
        for key in [(c, t)]
    ]
    fb_all.sort(key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    fb = fb_all[:fb_docs]
    if not fb:
        return []
    stot = sum(s for _, s in fb)
    prm: dict[str, float] = {}
    for key, s in fb:
        dl = idx.doc_len[key]
        for t, c in idx.doc_tf[key].items():
            prm[t] = prm.get(t, 0.0) + c / dl * s / stot
    top_terms = sorted(
        ((t, round(p, 6)) for t, p in prm.items()), key=lambda kv: (-kv[1], kv[0])
    )[:fb_terms]
    psum = sum(p for _, p in top_terms)
    weights: dict[str, float] = {t: orig_weight / len(terms) for t in terms}
    for t, p in top_terms:
        weights[t] = weights.get(t, 0.0) + (1.0 - orig_weight) * p / psum
    n = idx.n_docs
    avglen = sum(idx.doc_len.values()) / n if n else 0.0
    scores: dict[tuple[str, int], float] = {}
    for t, w in weights.items():
        dfreq = idx.df.get(t)
        if not dfreq:
            continue
        idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        for key, tf in idx.doc_tf.items():
            c = tf.get(t)
            if c:
                dl = idx.doc_len[key]
                s = w * (idf * c * (K1 + 1.0) / (c + K1 * (1.0 - B + B * dl / avglen)))
                scores[key] = scores.get(key, 0.0) + s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    return [(c, t, s) for (c, t), s in ranked[:k]]

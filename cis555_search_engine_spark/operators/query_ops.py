"""Query-time serving operators beyond plain ranked retrieval.

Reference scope: the frontend's query pipeline (frontend/SearchHelper.java,
XPathApp.java) stops at term-IN-list BM25/tf-idf ranking. A real search
frontend over the same index also needs proximity ranking, prefix
completion, spelling suggestions, query expansion, and related-document
retrieval — all serveable from the SAME index artifacts (postings with
positions, doc stats, corpus stats) with no extra index structures. Each
operator here is a declarative DataFrame program over
:class:`~cis555_search_engine_spark.operators.index_build.InvertedIndex`;
nothing leaves the JVM (no Python UDFs), so every plan whole-stage-codegens
and scales with the posting partitioning.

Scale notes per operator are in the docstrings; the common theme: all
per-doc work is column arithmetic over already-partitioned postings, all
"small" sides (query vectors, vocabularies) are broadcast, and top-k is
``orderBy().limit()`` (TakeOrderedAndProject: per-partition heap + driver
merge, never a global sort).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .index_build import InvertedIndex
from .scoring import bm25_score_col

# ------------------------------------------------------------ proximity


def _min_cross_gap(pos_a: Column, pos_b: Column) -> Column:
    """Minimum |x - y| over x ∈ pos_a, y ∈ pos_b as a native column.

    O((n+m)·log(n+m)) merge, not the O(n·m) pairwise product: tag each
    position with its source, sort the merged array, and take the min
    over ADJACENT opposite-source pairs. The closest cross-source pair
    is always adjacent in merged order (any element strictly between a
    candidate pair would itself form a closer pair with one endpoint),
    so this is exact. Matters at scale: a spammy doc with tf≈10⁴ for
    both terms costs 2·10⁴ log — not 10⁸ — comparisons per doc.
    """
    tag = lambda ps, s: F.transform(ps, lambda p: F.struct(p.alias("p"), F.lit(s).alias("s")))
    merged = F.array_sort(F.concat(tag(pos_a, 0), tag(pos_b, 1)))
    n = F.size(merged)
    gaps = F.zip_with(
        F.slice(merged, 1, n - 1),
        F.slice(merged, 2, n - 1),
        lambda u, v: F.when(u["s"] != v["s"], v["p"] - u["p"]),
    )
    return F.array_min(gaps)  # array_min skips the same-source NULL slots


def proximity_topk(
    index: InvertedIndex, term_a: str, term_b: str, k: int = 40
) -> DataFrame:
    """BM25 + positional-proximity ranking for a two-term query.

    Candidates are the posting-list INTERSECTION (both terms present —
    proximity is undefined otherwise); score = BM25(a) + BM25(b) +
    1/(1 + min_gap) where min_gap is the closest distance between an
    occurrence of ``term_a`` and one of ``term_b`` in the kept-token
    position space the index already stores (reference stores the same
    positions per posting, indexer/Indexer.java:159-173 — it never
    exploits them for ranking; this operator does).

    Scale: each term filter is an index lookup (term-pruned scan), the
    intersection is one equi-join on the doc key, the gap is per-row
    array math — no shuffle beyond the join, no UDF.
    Returns (doc_key..., min_gap, score) top-k by (score desc, key asc).
    """
    key = list(index.doc_key)

    def side(term: str, tag: str) -> DataFrame:
        stats = index.corpus_stats.filter(F.col("term") == term)
        return (
            index.postings.filter(F.col("term") == term)
            .join(F.broadcast(stats.select("term", "idf_bm25")), "term")
            .select(
                *key,
                F.col("tf").alias(f"tf_{tag}"),
                F.col("positions").alias(f"pos_{tag}"),
                F.col("idf_bm25").alias(f"idf_{tag}"),
            )
        )

    both = side(term_a, "a").join(side(term_b, "b"), key)
    scored = (
        both.join(index.doc_stats.select(*key, "doc_len"), key)
        .withColumn("min_gap", _min_cross_gap(F.col("pos_a"), F.col("pos_b")))
        .withColumn(
            "score",
            bm25_score_col(F.col("tf_a"), F.col("idf_a"), F.col("doc_len"), index.avg_doc_len)
            + bm25_score_col(F.col("tf_b"), F.col("idf_b"), F.col("doc_len"), index.avg_doc_len)
            + 1.0 / (1.0 + F.col("min_gap")),
        )
        .select(*key, "min_gap", "score")
    )
    order = [F.desc("score")] + [F.asc(c) for c in key]
    return scored.orderBy(*order).limit(k)


# ----------------------------------------------------------- completion


def term_completion(index: InvertedIndex, prefix: str, k: int = 20) -> DataFrame:
    """Prefix autocomplete from the term dictionary: terms starting with
    ``prefix`` ranked by document frequency (df desc, term asc).

    Scale: the dictionary (corpus_stats) is vocabulary-sized, orders of
    magnitude smaller than postings; ``startswith`` on a persisted
    dictionary sorted/partitioned by term becomes a parquet min/max
    range prune (StartsWith pushes down as `term >= p AND term < p̄`).
    """
    return (
        index.corpus_stats.filter(F.col("term").startswith(prefix))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


# ------------------------------------------------------- spell suggest


def _deletions(term: Column) -> Column:
    """All single-character deletions of ``term`` plus ``term`` itself —
    the SymSpell key set, generated natively (no UDF)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        lambda i: F.concat(
            F.substring(term, F.lit(1), i - 1),
            term.substr(i + 1, F.length(term)),
        ),
    )
    return F.array_union(F.array(term), dels)


def spell_suggest(index: InvertedIndex, query_term: str, k: int = 10) -> DataFrame:
    """Edit-distance-1 spelling suggestions via the symmetric-delete
    (SymSpell) scheme, verified exactly.

    Candidate generation never compares all vocab terms to the query:
    both sides are keyed by their single-deletion neighborhoods
    ({t} ∪ del₁(t)); any distance-1 pair (deletion, insertion, or
    substitution) shares a key, and the few distance-2 collisions the
    keys admit (e.g. transpositions) are removed by an exact
    ``levenshtein`` check on the candidates only. The vocab-side key
    explode is |vocab|·(len+1) rows — dictionary-scale, the SymSpell
    index one would persist for serving.

    Returns (term, df, dist) ranked (df desc, term asc): most-attested
    correction first, the reference-style deterministic tie-break.
    """
    q = query_term
    qkeys = {q} | {q[:i] + q[i + 1 :] for i in range(len(q))}
    cand = (
        index.corpus_stats.select("term", "df")
        .withColumn("dkey", F.explode(_deletions(F.col("term"))))
        .filter(F.col("dkey").isin(sorted(qkeys)))
        .select("term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(query_term)))
        .filter(F.col("dist") <= 1)
    )
    return (
        cand.select("term", F.col("df").cast("long").alias("df"), "dist")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


# ------------------------------------------------------ query expansion


def expand_query(
    index: InvertedIndex, seed: str, k: int = 15, min_df: int = 2
) -> DataFrame:
    """Co-occurrence query expansion: terms most associated with ``seed``
    by doc-level confidence P(seed | term) = joint_df / df(term).

    The association ratio ranks terms that *imply* the seed highest —
    the classic pseudo-relevance expansion signal, computed from the
    index alone (postings rows are unique per (doc, term), so a count
    after the doc-key semi-join IS the joint document frequency).

    Scale: the seed's doc list is one term-pruned index lookup; the
    semi-join shuffles on the doc key the postings already carry;
    the per-term aggregate is vocabulary-sized. The division of two
    BIGINTs is IEEE-exact cross-engine (correctly-rounded), so the
    ranking is reproducible bit-for-bit.
    Returns (term, joint_df, df, assoc) top-k (assoc desc, joint desc,
    term asc).
    """
    key = list(index.doc_key)
    seed_docs = index.postings.filter(F.col("term") == seed).select(*key)
    joint = (
        index.postings.join(seed_docs, key, "left_semi")
        .filter(F.col("term") != seed)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("joint_df"))
    )
    out = (
        # broadcast JOINT (terms co-occurring with ONE seed — inherently
        # small), never the full corpus_stats vocabulary: at a 10^8-term
        # vocabulary a forced stats broadcast is a multi-GB ship to
        # every executor, the unbounded-broadcast class the round-3
        # verdict flagged in cosine_lsh_pairs
        F.broadcast(joint)
        .join(index.corpus_stats.select("term", "df"), "term")
        .filter(F.col("df") >= min_df)
        .select(
            "term",
            F.col("joint_df").cast("long").alias("joint_df"),
            F.col("df").cast("long").alias("df"),
            F.round(F.col("joint_df").cast("double") / F.col("df"), 6).alias("assoc"),
        )
    )
    return out.orderBy(F.desc("assoc"), F.desc("joint_df"), F.asc("term")).limit(k)


# ------------------------------------------------------- more like this


def _doc_weights(index: InvertedIndex) -> DataFrame:
    """Per-(doc, term) reference tf-idf weight w = tf_norm · idf_ref
    (frontend/SearchHelper.java:138-185 weighting, oracle.py §tf-idf)."""
    key = list(index.doc_key)
    return (
        index.postings.join(index.doc_stats.select(*key, "max_tf"), key)
        .join(index.corpus_stats.select("term", "idf_ref"), "term")
        .select(
            *key,
            "term",
            (
                (1.0 + F.log(F.col("tf").cast("double")))
                / (1.0 + F.log(F.col("max_tf").cast("double")))
                * F.col("idf_ref")
            ).alias("w"),
        )
    )


def more_like_this(index: InvertedIndex, doc_id, k: int = 20) -> DataFrame:
    """Related-document retrieval: top-k docs by tf-idf cosine to a
    source document, joining only on the terms the source contains.

    The source's weight vector (≤ its distinct-term count rows) is
    broadcast; candidate scoring touches only postings whose term
    appears in the source — the same term-pruned access path as a
    query, with the source doc acting as the query. Norms are one
    corpus-wide per-doc aggregate (computed once; at serving scale this
    is a persisted doc-stats column, like doc_len already is).

    Single-column doc keys only (doc_id) — the documents-table analog
    of the reference's urlid.
    Returns (doc_id, score) top-k (score desc, doc_id asc), source
    excluded.
    """
    (kcol,) = index.doc_key
    w = _doc_weights(index)
    norms = w.groupBy(kcol).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    src = w.filter(F.col(kcol) == doc_id).select(
        "term", F.col("w").alias("w_src")
    )
    # source norm from the tiny source vector, NOT a second evaluation
    # of the full-corpus norms aggregate
    src_norm = src.agg(
        F.sqrt(F.sum(F.col("w_src") * F.col("w_src"))).alias("norm_src")
    )
    dots = (
        w.filter(F.col(kcol) != doc_id)
        .join(F.broadcast(src), "term")
        .groupBy(kcol)
        .agg(F.sum(F.col("w") * F.col("w_src")).alias("dot"))
    )
    scored = (
        dots.join(norms, kcol)
        .crossJoin(F.broadcast(src_norm))
        .select(
            kcol,
            (F.col("dot") / (F.col("norm") * F.col("norm_src"))).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc(kcol)).limit(k)


# ------------------------------------------------- grouped (conversation)


def group_topk(
    scored_docs: DataFrame,
    doc_meta: DataFrame,
    group_col: str,
    doc_key: Sequence[str],
    k: int = 10,
) -> DataFrame:
    """Conversation-level retrieval: aggregate per-turn scores to their
    parent group (conv_id in the transcript model; ``source`` in the
    documents table) and rank groups.

    Group score = Σ member scores (every matching turn adds evidence),
    with the member count and best single-turn score carried for the
    frontend. One shuffle on the group key after the doc-key join;
    the scored side is already top-pruned or term-pruned by the caller,
    so the join's left side is small relative to the corpus.
    Returns (group, score, n_docs, best) top-k (score desc, group asc).
    """
    key = list(doc_key)
    joined = scored_docs.join(doc_meta.select(*key, group_col), key)
    agg = joined.groupBy(group_col).agg(
        F.sum("score").alias("score"),
        F.count(F.lit(1)).alias("n_docs"),
        F.max("score").alias("best"),
    )
    return agg.orderBy(F.desc("score"), F.asc(group_col)).limit(k)


# ------------------------------------------------- boolean query language

_QUERY_TOKEN = re.compile(r'(-?)"([^"]*)"?|(-?)([^\s"]+)')


def parse_boolean_query(query: str) -> dict:
    """Parse the facade's boolean query syntax into its four parts:

        hash join "merge sort" -noodle -"rice noodle"

    -> {"terms": ["hash", "join"], "phrases": ["merge sort"],
        "not_terms": ["noodle"], "not_phrases": ["rice noodle"]}

    Pure Python, no Spark. Bare terms score (BM25, OR semantics by
    default); quoted phrases are REQUIRED (their terms also score);
    '-' negates a term or phrase. An unterminated quote swallows the
    rest of the query as the phrase (forgiving, never an error — the
    reference frontend's sanitizer philosophy, SearchHelper.java:138).
    Term text is NOT normalized here — the downstream operators run
    every part through the same tokenize+stem pipeline as document
    text, so 'Noodle' and 'noodle' negate the same postings.
    """
    out: dict = {"terms": [], "phrases": [], "not_terms": [], "not_phrases": []}
    for m in _QUERY_TOKEN.finditer(query or ""):
        neg_p, phrase, neg_t, term = m.groups()
        if phrase is not None:
            if phrase.strip():
                out["not_phrases" if neg_p else "phrases"].append(phrase.strip())
        elif term and term != "-":
            out["not_terms" if neg_t else "terms"].append(term)
    return out


# ------------------------------------------------------ rank fusion (hybrid)


def rrf_fuse(
    rankings: Sequence[DataFrame],
    key: str | Sequence[str] = "doc_id",
    c: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    fuse N independent rankings of the same id space into one list by

        rrf(d) = Σ_legs  1 / (c + rank_leg(d))

    Each input frame must be (key..., rank) with 1-based integer ranks
    (absent = the doc didn't make that leg's cut — contributes 0, the
    standard RRF convention). Returns (key..., n_legs, rrf), top-k by
    (rrf DESC, key ASC).

    RRF is the standard score-free way to combine a lexical (BM25) and
    a vector (embedding-cosine) retriever — no score calibration needed
    because only integer ranks enter the sum, which also makes the
    fusion bit-reproducible across engines (the per-leg score scales
    never meet). The reference engine is lexical-only; this fuses its
    ranking with the similarity module's ANN leg.

    Scale notes: leg frames are already top-N cuts (bounded, ≤ N rows
    each), so the union + hash-agg here is over O(N·legs) rows
    regardless of corpus size; the heavy lifting stays in each leg's
    own distributed plan.
    """
    keys = [key] if isinstance(key, str) else list(key)
    legs = [r.select(*keys, "rank") for r in rankings]
    allr = legs[0]
    for leg in legs[1:]:
        allr = allr.unionByName(leg)
    return (
        allr.groupBy(*keys)
        .agg(
            F.count("*").cast("int").alias("n_legs"),
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))), 6
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), *[F.asc(kc) for kc in keys])
        .limit(k)
    )


def with_rank(topn: DataFrame, order: Sequence[Column], out: str = "rank") -> DataFrame:
    """1-based row_number ranks over an ALREADY top-N-cut frame. The
    ordering must be TOTAL (include an id tie-break): row_number gives
    tied rows distinct ranks in nondeterministic order otherwise.

    The single-partition window here is deliberate and safe: callers
    pass a bounded frame (an ``orderBy().limit(N)`` result, N ≤ a few
    hundred), so the window sorts N rows on one task — the global
    ordering work already happened in the leg's TakeOrderedAndProject.
    Never call this on an uncut table."""
    from pyspark.sql import Window

    return topn.withColumn(out, F.row_number().over(Window.orderBy(*order)))


# ------------------------------------------------- next-word suggestion


def next_word_suggest(
    index: InvertedIndex, prev_term: str, k: int = 10
) -> DataFrame:
    """Query auto-completion of the NEXT word: the terms that most often
    immediately follow ``prev_term`` in the corpus, served FROM THE
    INDEX ALONE — the positions the postings already carry (reference
    stores the same per-posting positions, indexer/Indexer.java:159-173)
    make bigram adjacency an array intersection, no corpus re-scan and
    no positioned-token self-join.

    follow_cnt(t) = Σ_docs |{p ∈ pos(prev)} : p+1 ∈ pos(t)| — exact
    adjacent-occurrence count (positions are distinct within a doc, so
    the intersection size IS the occurrence count).

    Scale shape: one term-pruned index lookup (the prev term's posting
    list), one equi-join on the doc key against postings — the join is
    bounded by df(prev) docs, NOT the corpus — then per-row array math
    and one term-keyed hash agg (partial map-side). The prev side is
    broadcast (a single posting list). Returns (term, follow_cnt) top-k
    by (follow_cnt desc, term asc).
    """
    key = list(index.doc_key)
    prev = (
        index.postings.filter(F.col("term") == prev_term)
        .select(*key, F.col("positions").alias("_ppos"))
    )
    c = F.size(
        F.array_intersect(
            F.transform(F.col("_ppos"), lambda p: p + 1), F.col("positions")
        )
    )
    return (
        index.postings.join(F.broadcast(prev), key)
        .select("term", c.alias("c"))
        .filter(F.col("c") > 0)
        .groupBy("term")
        .agg(F.sum("c").cast("long").alias("follow_cnt"))
        .orderBy(F.desc("follow_cnt"), F.asc("term"))
        .limit(k)
    )


# ------------------------------------------------- permuterm wildcards


def _rotations(term: Column) -> Column:
    """All rotations of ``term || '$'`` — the permuterm key set
    (Manning/Raghavan/Schütze IR ch. 3.2.1), generated natively. A term
    of length L yields L+1 distinct rotations ('$' occurs exactly once,
    so no rotation repeats)."""
    t = F.concat(term, F.lit("$"))
    L = F.length(t)
    return F.transform(
        F.sequence(F.lit(0), L - 1),
        lambda i: F.concat(t.substr(i + 1, L), t.substr(F.lit(1), i)),
    )


def wildcard_terms(index: InvertedIndex, pattern: str, k: int = 20) -> DataFrame:
    """Wildcard term lookup ``pre*suf`` via the permuterm index: rotate
    each vocab term's ``term$`` and prefix-match the rotated query key
    ``suf$pre`` — the classic single-`*` wildcard scheme (IR book ch.
    3.2.1; the reference frontend has no wildcard support — engine
    addition over the same term dictionary).

    Exactly one rotation of a matching term starts with the key (the
    '$' pins the alignment), so no dedup pass is needed. Returns
    (term, df) for the k most-attested matches (df desc, term asc) —
    the maxExpansions discipline that keeps downstream OR-scoring
    bounded.

    Scale shape: the rotation explode is |vocab|·(len+2) rows —
    dictionary-scale, the permuterm table one would persist for
    serving; the prefix filter is a native StartsWith over it, and the
    top-k is TakeOrderedAndProject. No joins, no UDF.
    """
    if pattern.count("*") != 1:
        raise ValueError(f"exactly one '*' supported, got {pattern!r}")
    pre, suf = pattern.split("*")
    rkey = f"{suf}${pre}"
    return (
        index.corpus_stats.select("term", F.col("df").cast("long").alias("df"))
        .withColumn("rot", F.explode(_rotations(F.col("term"))))
        .filter(F.col("rot").startswith(rkey))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def wildcard_topk(
    index: InvertedIndex, pattern: str, k: int = 40, max_expansions: int = 20
) -> DataFrame:
    """BM25 top-k for a wildcard query: OR-semantics over the matched
    term set (Lucene's MultiTermQuery rewrite — expand to the
    ``max_expansions`` highest-df matches, then score the union). Same
    Σ-BM25 fold as the reference's OR ranking (SearchHelper.java:167-177)
    with the literal IN-list replaced by a join against the bounded
    expansion frame.

    Scale shape: the expansion frame is ≤ max_expansions rows →
    broadcast by construction; postings prune to those terms; the idf
    side is the stats semi-joined to the same bounded set, also
    broadcast (the discipline of bm25_scores — never ship vocab-sized
    stats). One doc-key hash agg, then TakeOrderedAndProject.
    """
    key = list(index.doc_key)
    terms = wildcard_terms(index, pattern, k=max_expansions).select("term")
    idf = index.corpus_stats.join(terms, "term").select("term", "idf_bm25")
    scored = (
        index.postings.join(F.broadcast(terms), "term")
        .join(F.broadcast(idf), "term")
        .join(index.doc_stats.select(*key, "doc_len"), key)
        .withColumn(
            "partial",
            bm25_score_col(
                F.col("tf"), F.col("idf_bm25"), F.col("doc_len"), index.avg_doc_len
            ),
        )
        .groupBy(*key)
        .agg(F.round(F.sum("partial"), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), *[F.asc(c) for c in key]).limit(k)

"""Query-time scoring: BM25 (primary) and reference tf-idf (parity).

Reference query lifecycle (SURVEY.md §3.1, frontend/SearchHelper.java):
one MySQL SQL — semi-join postings on the query's term IN-list, hash-agg
Σweight per doc, LEFT JOIN doc map + pagerank, ORDER BY score DESC LIMIT 80.

Spark rebuild: the query's terms become a literal IN-list / broadcast
semi-join (J1), scoring is pure column arithmetic (no UDF), the top-k is
``orderBy(...).limit(k)`` which Spark plans as TakeOrderedAndProject —
a per-partition heap + driver merge, NO global sort, the right plan at
any scale.

Tie-break everywhere: (score DESC, doc_key ASC) — deterministic where the
reference (TreeMap insertion order / MySQL sort instability) is not
(SURVEY §2.6 T2).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from ..functions.porter import porter_stem
from ..functions.tokenizer import tokenize_py
from .index_build import InvertedIndex

K1 = 1.2
B = 0.75


def bm25_query_terms(query: str) -> list[str]:
    """Stemmed, deduplicated query terms. The query goes through the SAME
    tokenizer as documents (reference sanitizes queries to [a-z0-9 ],
    XPathApp.java:42-51; tokenize_py subsumes that)."""
    return list(dict.fromkeys(porter_stem(t) for t in tokenize_py(query)))


def ref_query_terms(query: str) -> list[str]:
    """Reference semantics: stem(k) AND raw k for every keyword
    (SearchHelper.java:138-144)."""
    out: dict[str, None] = {}
    for kw in tokenize_py(query):
        out.setdefault(porter_stem(kw), None)
        out.setdefault(kw, None)
    return list(out)


def _topk(scored: DataFrame, doc_key: Sequence[str], k: int) -> DataFrame:
    order = [F.desc("score")] + [F.asc(c) for c in doc_key]
    return scored.orderBy(*order).limit(k)


def bm25_score_col(tf: Column, idf: Column, doc_len: Column, avg_len: float) -> Column:
    """BM25 per-(term,doc) partial score as a native column expression."""
    denom = tf + K1 * (1.0 - B + B * doc_len / F.lit(avg_len))
    return idf * tf * (K1 + 1.0) / denom


def bm25_topk(
    index: InvertedIndex,
    query: str,
    k: int = 80,
    stem: bool = True,
    conjunctive: bool = False,
) -> DataFrame:
    """Top-k docs by BM25. Returns (doc_key..., score).

    ``stem=False`` matches raw tokens (for indexes built with stem=False).
    ``conjunctive=True`` = posting-list INTERSECTION (doc must contain
    every query term; north-rule AND semantics) — expressed as the same
    hash agg plus ``HAVING count(distinct term) = |terms|``, which
    Catalyst folds into the aggregate: no second pass. The reference is
    OR-semantics (Σ over whatever terms hit, SearchHelper.java:167-177).
    """
    scored = bm25_scores(index, query, stem=stem, conjunctive=conjunctive)
    if scored is None:
        return _empty(index)
    return _topk(scored, list(index.doc_key), k)


def bm25_scores(
    index: InvertedIndex,
    query: str,
    stem: bool = True,
    conjunctive: bool = False,
) -> DataFrame | None:
    """The FULL BM25 match set (doc_key..., score) — no top-k cut.

    The shared body of :func:`bm25_topk` (which adds the
    TakeOrderedAndProject) and :func:`facet_counts` (which aggregates
    the whole match set instead of cutting it). Returns None for an
    empty query (callers decide the empty shape)."""
    terms = bm25_query_terms(query) if stem else list(dict.fromkeys(tokenize_py(query)))
    if not terms:
        return None
    key = list(index.doc_key)
    matched = index.postings.filter(F.col("term").isin(terms))
    grouped = (
        matched.join(F.broadcast(index.corpus_stats.filter(F.col("term").isin(terms))), "term")
        .join(index.doc_stats.select(*key, "doc_len"), key)
        .withColumn(
            "partial",
            bm25_score_col(F.col("tf"), F.col("idf_bm25"), F.col("doc_len"), index.avg_doc_len),
        )
        .groupBy(*key)
        .agg(
            F.sum("partial").alias("score"),
            F.count_distinct(F.col("term")).alias("n_terms_hit"),
        )
    )
    if conjunctive:
        grouped = grouped.filter(F.col("n_terms_hit") == len(terms))
    return grouped.select(*key, "score")


def facet_counts(
    index: InvertedIndex,
    query: str,
    meta: DataFrame,
    facet_col: str,
    stem: bool = True,
    conjunctive: bool = False,
) -> DataFrame:
    """(facet, n_docs, max_score, min_score) over the FULL BM25 match
    set of ``query`` — search-result facetting (the "narrow by source /
    site / language" panel every production search UI has; the reference
    frontend has no facets, SURVEY §3.1, so this is an engine addition).

    ``meta`` is a (doc_key..., facet_col) frame. Shape at scale: the
    match set (bounded by the query terms' document frequencies) joins
    doc metadata on the doc key, then ONE hash agg keyed by the facet
    value — partial agg map-side, and per-facet max/min/count are
    order-independent, so the result is bit-deterministic under any
    partitioning (a SUM of floats would not be: accumulation order
    varies run to run — that is why the facet "score summary" is
    max/min, not mean).

    Scores are rounded to 4 dp BEFORE the facet agg (same contract as
    the ranked queries' outputs).
    """
    key = list(index.doc_key)
    scored = bm25_scores(index, query, stem=stem, conjunctive=conjunctive)
    if scored is None:
        empty = meta.select(F.col(facet_col).alias("facet")).limit(0)
        return empty.select(
            "facet",
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0.0).alias("max_score"),
            F.lit(0.0).alias("min_score"),
        )
    rounded = scored.select(*key, F.round("score", 4).alias("s"))
    return (
        rounded.join(meta.select(*key, F.col(facet_col).alias("facet")), key)
        .groupBy("facet")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("s").alias("max_score"),
            F.min("s").alias("min_score"),
        )
    )


def query_term_pairs(
    queries: dict[str, str], stem: bool = True
) -> list[tuple[str, str, int]]:
    """(qid, term, n_query_terms) rows for a query batch — the ONE
    definition of batch query expansion (tokenize → optional stem →
    order-preserving dedupe), shared by the batch scorer, the rank-eval
    qrels builder, and the scale demos so the term pipeline cannot
    silently diverge between them."""
    pairs: list[tuple[str, str, int]] = []
    for qid, q in queries.items():
        terms = bm25_query_terms(q) if stem else list(dict.fromkeys(tokenize_py(q)))
        pairs += [(qid, t, len(terms)) for t in terms]
    return pairs


def bm25_topk_many(
    index: InvertedIndex,
    queries: dict[str, str],
    k: int = 10,
    stem: bool = True,
    conjunctive: bool = False,
) -> DataFrame:
    """Batch query API: score MANY queries in ONE Spark job.

    Returns (qid, doc_key..., score), per-query top-k. The reference's
    frontend answered queries one SQL round-trip at a time
    (frontend/SearchHelper.java:155-185, ~2.3-3.3s each); a user with a
    query log wants the amortized path: the (qid, term) pairs become a
    broadcast frame joined against postings once, scoring is one hash
    agg keyed by (qid, doc), and the per-query top-k is a window
    row_number partitioned by qid — no per-query job, no per-query
    driver round-trip. At scale #queries >> #cores, so the qid window
    partitioning is skew-free and the whole batch is one shuffle.
    """
    key = list(index.doc_key)
    pairs = query_term_pairs(queries, stem=stem)
    if not pairs:
        return _empty_many(index)
    spark = index.postings.sparkSession
    qdf = spark.createDataFrame(pairs, "qid string, term string, n_query_terms int")
    all_terms = sorted({t for _, t, _ in pairs})
    matched = index.postings.filter(F.col("term").isin(all_terms))
    cs = index.corpus_stats.filter(F.col("term").isin(all_terms)).select("term", "idf_bm25")
    scored = (
        matched.join(F.broadcast(qdf), "term")
        .join(F.broadcast(cs), "term")
        .join(index.doc_stats.select(*key, "doc_len"), key)
        .withColumn(
            "partial",
            bm25_score_col(F.col("tf"), F.col("idf_bm25"), F.col("doc_len"), index.avg_doc_len),
        )
        .groupBy("qid", *key)
        .agg(
            F.sum("partial").alias("score"),
            F.count_distinct(F.col("term")).alias("n_terms_hit"),
            F.first("n_query_terms").alias("n_query_terms"),
        )
    )
    if conjunctive:
        scored = scored.filter(F.col("n_terms_hit") == F.col("n_query_terms"))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), *[F.asc(c) for c in key])
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", *key, "score")
    )


def with_snippets(
    top: DataFrame,
    docs: DataFrame,
    query: str,
    doc_key: Sequence[str],
    text_col: str = "text",
    window: int = 90,
    lead: int = 30,
) -> DataFrame:
    """Join top-k results back to the corpus and project a text snippet
    centered on the first occurrence of the query's FIRST term
    (reference analog: the frontend's cached-page preview,
    frontend/SearchHelper.java getCachedPages / XPathApp.java:119-173).

    The join is a broadcast of the (tiny) top-k against the corpus —
    never the reverse — so the corpus scan stays pruned to the matched
    keys. Snippet = substring(text, max(1, pos-lead), window), pos =
    1-based locate of the term (start of text when absent) — expressible
    identically in ANSI SQL (strpos/substr), hence oracle-checkable.
    """
    terms = tokenize_py(query)
    first = terms[0] if terms else ""
    key = list(doc_key)
    # semi-join the corpus down to the k matched keys FIRST (broadcast of
    # the tiny top-k key set), so lower/locate/substr run on k rows, not
    # the whole corpus; the final left join then has a tiny right side
    matched = docs.join(F.broadcast(top.select(*key)), key, "left_semi")
    pos = F.locate(first, F.lower(F.col(text_col)))
    start = F.when(pos > 0, F.greatest(F.lit(1), pos - lead)).otherwise(F.lit(1))
    enriched = matched.select(
        *key, F.col(text_col).substr(start, F.lit(window)).alias("snippet")
    )
    return top.join(F.broadcast(enriched), key, "left").select(*top.columns, "snippet")


def _empty_many(index: InvertedIndex) -> DataFrame:
    from pyspark.sql import types as T

    fields = (
        [T.StructField("qid", T.StringType())]
        + index.doc_stats.select(*index.doc_key).schema.fields
        + [T.StructField("score", T.DoubleType())]
    )
    return index.postings.sparkSession.createDataFrame([], T.StructType(fields))


def _empty(index: InvertedIndex) -> DataFrame:
    from pyspark.sql import types as T

    fields = index.doc_stats.select(*index.doc_key).schema.fields + [
        T.StructField("score", T.DoubleType())
    ]
    return index.postings.sparkSession.createDataFrame([], T.StructType(fields))


def cosine_ref_topk(
    index: InvertedIndex, query: str, k: int = 40, stem: bool = True
) -> DataFrame:
    """The reference's SECOND ranker — cosine similarity
    (frontend/SearchHelperYezheng.java:226-242, SURVEY §2.4 A9):

        per doc:  innerProduct = Σ_t weight(t,doc) · idf_ref(t)
                  sumOfSquare  = Σ_t weight(t,doc)²
        score = innerProduct / sqrt(sumOfSquare)

    (the query vector's own norm is constant per query, so the reference
    drops it). Match terms = stem(q) ∪ raw(q), same as the tf-idf ranker;
    top-k = 40 there (TreeMap cut, SearchHelperYezheng.java:252).
    """
    terms = ref_query_terms(query) if stem else list(dict.fromkeys(tokenize_py(query)))
    key = list(index.doc_key)
    matched = index.postings.filter(F.col("term").isin(terms))
    scored = (
        matched.join(F.broadcast(index.corpus_stats.filter(F.col("term").isin(terms))), "term")
        .join(index.doc_stats.select(*key, "max_tf"), key)
        .withColumn(
            "weight",
            (1.0 + F.log("tf")) / (1.0 + F.log("max_tf")) * F.col("idf_ref"),
        )
        .groupBy(*key)
        .agg(
            F.sum(F.col("weight") * F.col("idf_ref")).alias("inner_product"),
            F.sum(F.col("weight") * F.col("weight")).alias("sum_of_square"),
        )
        .select(*key, (F.col("inner_product") / F.sqrt("sum_of_square")).alias("score"))
    )
    return _topk(scored, key, k)


def tfidf_ref_topk(
    index: InvertedIndex,
    query: str,
    k: int = 80,
    prior: DataFrame | None = None,
    stem: bool = True,
) -> DataFrame:
    """Reference parity ranker (SearchHelper.java:155-185):

    score(doc) = Σ_{t ∈ stem(q) ∪ raw(q)} (1+ln tf)/(1+ln max_tf) · ln(Np/df)
                 (+ 0.5 · coalesce(prior, 0))
    """
    terms = ref_query_terms(query) if stem else list(dict.fromkeys(tokenize_py(query)))
    key = list(index.doc_key)
    matched = index.postings.filter(F.col("term").isin(terms))
    scored = (
        matched.join(F.broadcast(index.corpus_stats.filter(F.col("term").isin(terms))), "term")
        .join(index.doc_stats.select(*key, "max_tf"), key)
        .withColumn(
            "weight",
            (1.0 + F.log("tf")) / (1.0 + F.log("max_tf")) * F.col("idf_ref"),
        )
        .groupBy(*key)
        .agg(F.sum("weight").alias("score"))
    )
    if prior is not None:
        scored = (
            scored.join(prior, key, "left")
            .withColumn("score", F.col("score") + 0.5 * F.coalesce(F.col("rank"), F.lit(0.0)))
            .select(*key, "score")
        )
    return _topk(scored, key, k)


MU = 2000.0  # Dirichlet prior mass (Zhai & Lafferty's recommended range)


def lm_dirichlet_topk(
    index: InvertedIndex,
    query: str,
    k: int = 80,
    mu: float = MU,
    stem: bool = True,
) -> DataFrame:
    """Top-k docs by Dirichlet-smoothed query likelihood (Zhai &
    Lafferty, SIGIR 2001) — a second public ranking family over the
    same posting/stat frames the BM25 path serves (the reference ships
    two rankers, SearchHelper.java:155-185 + SearchHelperYezheng.java:
    226-242; this adds the standard LM alternative). Decomposed
    posting-driven form, so only matched postings are ever scanned:

        score(q,d) = Σ_{t ∈ q∩d} ln(1 + tf_{t,d}·T / (μ·cf_t))
                     + |q| · ln(μ / (doc_len_d + μ))

    where cf_t = collection frequency of t and T = total corpus tokens.
    Scale notes: cf comes from ONE hash agg over the query-term-matched
    postings (≤|q| result rows, broadcast back — never vocab-sized);
    T = n_docs·avg_doc_len is a driver scalar the index already holds.
    Docs matching no query term are not scored (posting-driven
    retrieval, same contract as the BM25/tf-idf rankers).
    """
    scored = lm_dirichlet_scores(index, query, mu=mu, stem=stem)
    if scored is None:
        return _empty(index)
    return _topk(scored, list(index.doc_key), k)


def lm_dirichlet_scores(
    index: InvertedIndex,
    query: str,
    mu: float = MU,
    stem: bool = True,
) -> DataFrame | None:
    """FULL Dirichlet-LM match set (doc_key..., score); None on an
    empty query. Shared body of :func:`lm_dirichlet_topk`."""
    terms = bm25_query_terms(query) if stem else list(dict.fromkeys(tokenize_py(query)))
    if not terms:
        return None
    key = list(index.doc_key)
    total_tokens = float(index.n_docs) * float(index.avg_doc_len)
    matched = index.postings.filter(F.col("term").isin(terms))
    # collection frequency of the QUERY terms only: one agg over the
    # matched postings, ≤|terms| rows out — safe to broadcast back
    cf = matched.groupBy("term").agg(F.sum("tf").cast("double").alias("cf"))
    return (
        matched.join(F.broadcast(cf), "term")
        .join(index.doc_stats.select(*key, "doc_len"), key)
        .withColumn(
            "partial",
            F.log(1.0 + F.col("tf") * F.lit(total_tokens) / (F.lit(mu) * F.col("cf"))),
        )
        .groupBy(*key)
        .agg(
            (
                F.sum("partial")
                + F.lit(float(len(terms)))
                * F.log(F.lit(mu) / (F.first("doc_len") + F.lit(mu)))
            ).alias("score")
        )
    )


# -------------------------------------------------- RM3 feedback (4th family)

def rm3_term_weights(
    index: InvertedIndex,
    query: str,
    fb_docs: int = 10,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
    stem: bool = True,
) -> DataFrame | None:
    """RM3 pseudo-relevance-feedback term weights (Lavrenko & Croft,
    SIGIR 2001; RM3 interpolation per Abdul-Jaleel et al., TREC 2004 —
    public literature; the reference engine has no feedback pass, this
    extends its single-shot ranker family, SearchHelper.java:155-185).

    Two-stage plan, all bounded frames:

    1. BM25 over the original query; the top ``fb_docs`` docs (ordered
       on the ROUNDED score + doc_key so the cutoff is reproducible
       cross-engine) become the pseudo-relevant set.
    2. Relevance model P(w|R) = Σ_d  tf(w,d)/doc_len(d) · P(d), with
       P(d) ∝ the doc's (rounded) BM25 score. The top ``fb_terms``
       terms by P(w|R) (rounded to 6dp for a stable cutoff) are
       renormalized and interpolated with the uniform original-query
       model at ``orig_weight``.

    Returns a tiny (term, w) frame, ≤ fb_terms + |query| rows.

    Scale notes: the feedback-doc frame is fb_docs rows → broadcast to
    the postings scan (the one unavoidable full-postings pass: RM3 by
    definition needs EVERY term of the feedback docs, so no term
    pushdown exists for stage 2 — it is one broadcast-pruned scan, not
    a shuffle). All other frames (score total, P(w|R) top terms, weight
    union) are ≤ fb_terms rows.
    """
    terms = bm25_query_terms(query) if stem else list(dict.fromkeys(tokenize_py(query)))
    if not terms:
        return None
    spark = index.postings.sparkSession
    key = list(index.doc_key)
    scored = bm25_scores(index, query, stem=stem)
    if scored is None:
        return None
    fb = (
        scored.select(*key, F.round("score", 4).alias("s"))
        .orderBy(F.desc("s"), *[F.asc(c) for c in key])
        .limit(fb_docs)
        .join(index.doc_stats.select(*key, "doc_len"), key)
    )
    stot = fb.agg(F.sum("s").alias("st"))
    prm = (
        index.postings.join(F.broadcast(fb), key)
        .crossJoin(F.broadcast(stot))
        .groupBy("term")
        .agg(
            F.round(
                F.sum(F.col("tf") / F.col("doc_len") * F.col("s") / F.col("st")), 6
            ).alias("p6")
        )
        .orderBy(F.desc("p6"), F.asc("term"))
        .limit(fb_terms)
    )
    psum = prm.agg(F.sum("p6").alias("ps"))
    qw = spark.createDataFrame([(t,) for t in terms], "term string").withColumn(
        "w", F.lit(float(orig_weight) / len(terms))
    )
    ew = prm.crossJoin(F.broadcast(psum)).select(
        "term", (F.lit(1.0 - orig_weight) * F.col("p6") / F.col("ps")).alias("w")
    )
    return qw.unionByName(ew).groupBy("term").agg(F.sum("w").alias("w"))


def rm3_topk(
    index: InvertedIndex,
    query: str,
    k: int = 80,
    fb_docs: int = 10,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
    stem: bool = True,
) -> DataFrame:
    """Top-k by RM3-weighted BM25: the interpolated feedback weights
    from :func:`rm3_term_weights` drive a weighted second BM25 pass
    (score(d) = Σ_w  weight(w)·bm25(w,d)) — the standard two-pass
    feedback retrieval loop, as a composition of the engine's existing
    scoring frames. Returns (doc_key..., score).

    The weight frame is collected once (bounded: ≤ fb_terms + |query|
    rows, same class as the centroid/offset collects) so the second
    pass gets a literal term IN-list — the expanded query scores with
    exactly the same pushdown/broadcast shape as a user-typed query.
    """
    wts = rm3_term_weights(
        index, query, fb_docs=fb_docs, fb_terms=fb_terms,
        orig_weight=orig_weight, stem=stem,
    )
    if wts is None:
        return _empty(index)
    rows = wts.collect()  # bounded: <= fb_terms + |query terms|
    if not rows:
        return _empty(index)
    spark = index.postings.sparkSession
    wdf = spark.createDataFrame(
        [(r["term"], float(r["w"])) for r in rows], "term string, w double"
    )
    wterms = [r["term"] for r in rows]
    key = list(index.doc_key)
    matched = index.postings.filter(F.col("term").isin(wterms))
    scored = (
        matched.join(F.broadcast(wdf), "term")
        .join(
            F.broadcast(
                index.corpus_stats.filter(F.col("term").isin(wterms)).select(
                    "term", "idf_bm25"
                )
            ),
            "term",
        )
        .join(index.doc_stats.select(*key, "doc_len"), key)
        .withColumn(
            "partial",
            F.col("w")
            * bm25_score_col(
                F.col("tf"), F.col("idf_bm25"), F.col("doc_len"), index.avg_doc_len
            ),
        )
        .groupBy(*key)
        .agg(F.sum("partial").alias("score"))
    )
    return _topk(scored, key, k)


# ----------------------------------------------- BM25F (fielded, 5th family)

def bm25f_scores(
    index: InvertedIndex,
    query: str,
    doc_fields: DataFrame,
    field_weights: dict[str, float],
    stem: bool = True,
    k1: float = K1,
    b: float = B,
    group_col: str = "group_id",
    field_col: str = "field",
) -> DataFrame | None:
    """Fielded BM25 (BM25F) over a doc→(group, field) mapping — the
    "simple BM25 extension to multiple weighted fields" of Robertson,
    Zaragoza & Taylor (CIKM 2004; public literature). The reference
    engine scores flat pages (frontend/SearchHelper.java:155-185); a
    transcript corpus is naturally FIELDED — a conversation's turns
    split by ``role`` (user / assistant / tool, BASELINE input_hint) —
    and role-weighted scoring is the standard way to rank conversations
    where, say, assistant text should count double and tool spam half.

    ``doc_fields`` is a (doc_key..., group_col, field_col) frame: each
    indexed doc (turn) belongs to one group (conversation) under one
    field (role). Semantics:

    - field length  len(g,f)   = Σ doc_len over the group's turns in f
    - avg field len avg(f)     = mean of len(g,f) over groups having f
    - weighted tf   tfw(g,t)   = Σ_f  w_f · tf(g,f,t)
                                  / (1 - b + b·len(g,f)/avg(f))
    - group idf     idf(t)     = ln((N_g - df_g + 0.5)/(df_g + 0.5) + 1),
                                 df_g = #groups containing t in ANY field
    - score(g)                 = Σ_t  idf(t) · tfw / (k1 + tfw)

    Returns the FULL (group_col, score) match set; None on an empty
    query. Callers round + order + cut (rounded-score ordering keeps
    the k-cutoff stable cross-engine, same contract as the LM ranker).

    Plan at scale: postings are filtered to the query terms BEFORE any
    join (term pushdown); field lengths are one hash agg over doc_stats
    keyed by (group, field) — map-side combinable, never broadcast
    (groups are unbounded); the per-field averages and per-term group
    dfs are tiny (≤ n_fields / ≤ |terms| rows) and broadcast; the final
    score is one hash agg keyed by group. Every agg is map-side
    combinable, every shuffle is keyed by (group[, field]) — no window,
    no UDF, no unbounded broadcast.
    """
    terms = bm25_query_terms(query) if stem else list(dict.fromkeys(tokenize_py(query)))
    if not terms:
        return None
    key = list(index.doc_key)
    fields = doc_fields.select(*key, group_col, field_col)
    # field lengths from the FULL doc_stats (lengths count every term,
    # not just the query's), one agg, never broadcast
    flen = (
        index.doc_stats.select(*key, "doc_len")
        .join(fields, key)
        .groupBy(group_col, field_col)
        .agg(F.sum("doc_len").cast("double").alias("len_f"))
    )
    avglen = flen.groupBy(field_col).agg(F.avg("len_f").alias("avg_f"))
    # per-(group, field) tf of the query terms only
    ftf = (
        index.postings.filter(F.col("term").isin(terms))
        .join(fields, key)
        .groupBy(group_col, field_col, "term")
        .agg(F.sum("tf").cast("double").alias("tf_f"))
    )
    wmap = F.create_map(
        *[lit for f, w in field_weights.items() for lit in (F.lit(f), F.lit(float(w)))]
    )
    wtf = (
        ftf.join(flen, [group_col, field_col])
        .join(F.broadcast(avglen), field_col)
        .withColumn("w_f", F.coalesce(wmap[F.col(field_col)], F.lit(0.0)))
        .withColumn(
            "tfn",
            F.col("w_f") * F.col("tf_f")
            / (F.lit(1.0 - b) + F.lit(b) * F.col("len_f") / F.col("avg_f")),
        )
        .groupBy(group_col, "term")
        .agg(F.sum("tfn").alias("tfw"))
    )
    # group-level df of the query terms (≤ |terms| rows → broadcast);
    # N_g is a bounded scalar action, same class as index.n_docs
    n_groups = float(fields.select(group_col).distinct().count())
    gdf = ftf.groupBy("term").agg(
        F.count_distinct(F.col(group_col)).cast("double").alias("df_g")
    )
    return (
        wtf.join(F.broadcast(gdf), "term")
        .withColumn(
            "partial",
            F.log((F.lit(n_groups) - F.col("df_g") + 0.5) / (F.col("df_g") + 0.5) + 1.0)
            * F.col("tfw") / (F.lit(k1) + F.col("tfw")),
        )
        .groupBy(group_col)
        .agg(F.sum("partial").alias("score"))
    )


# ------------------------------------- turn→conversation evidence aggregation

def evidence_scores(
    scored: DataFrame,
    doc_key: Sequence[str],
    group_col: str,
    m: int = 2,
) -> DataFrame:
    """Passage→document evidence aggregation: collapse per-turn scores
    to per-conversation scores as the SUM OF THE TOP-``m`` turn scores
    (the SumP evidence combiner of Dai & Callan, SIGIR 2019 passage
    ranking — public literature; m=1 degenerates to MaxP). The reference
    ranks flat pages; retrieving CONVERSATIONS from turn-level postings
    is the transcript-corpus analog of passage-level retrieval.

    ``scored`` carries (doc_key..., score, group_col). Returns the FULL
    (group_col, score, best_<doc_key[0]>...) set — best_* is the
    top-scoring turn, the one a UI would deep-link. Callers round +
    order + cut.

    Plan at scale: ONE window partitioned by group (groups are small —
    a conversation's turn count — and #groups >> cores, so the window
    is skew-free), then one hash agg on the same key: Catalyst plans a
    single shuffle, the agg reuses the window's partitioning.
    """
    from pyspark.sql import Window

    key = list(doc_key)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("score"), *[F.asc(c) for c in key]
    )
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= m)
    best = [
        F.min(F.when(F.col("rn") == 1, F.col(c))).alias(f"best_{c}") for c in key
    ]
    return ranked.groupBy(group_col).agg(F.sum("score").alias("score"), *best)


def best_window_snippets(
    index: InvertedIndex,
    docs: DataFrame,
    query: str,
    k: int = 10,
    window: int = 10,
    stem: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """Position-aware snippet generation for the BM25 top-k: for each
    result, the ``window``-token span covering the MOST DISTINCT query
    terms (ties → earliest start) — the classic passage-selection
    upgrade over `with_snippets`' first-occurrence substring (reference
    analog: the frontend preview, frontend/SearchHelper.java — which
    has no positional selection; the index's stored positions,
    indexer/Indexer.java:159-173, make it free here).

    The optimal window must start AT a query-term occurrence (shifting
    a window right to its first covered hit never drops a term), so
    candidates are the matched positions themselves — per-doc work is
    O(m²) column arithmetic on m = matched occurrences in ONE result
    doc, never corpus-scale.

    Scale shape: postings are pruned to the query terms, then semi-
    joined against the BROADCAST top-k key set — every downstream row
    count is bounded by k docs × query terms. One bounded groupBy
    collects the tagged positions per doc; the corpus join for the
    snippet text is again against the broadcast k keys. Returns
    (doc_key..., score, snip_start, n_terms, snippet).
    """
    from ..functions.tokenizer import tokenize_col, tokenize_py

    terms = bm25_query_terms(query) if stem else list(dict.fromkeys(tokenize_py(query)))
    key = list(index.doc_key)
    top = bm25_topk(index, query, k=k, stem=stem)
    if not terms:
        return top.select(
            *key, "score",
            F.lit(None).cast("long").alias("snip_start"),
            F.lit(None).cast("long").alias("n_terms"),
            F.lit(None).cast("string").alias("snippet"),
        )
    tagged = (
        index.postings.filter(F.col("term").isin(terms))
        .join(F.broadcast(top.select(*key)), key, "left_semi")
        .select(*key, "term", F.explode("positions").alias("pos"))
    )
    hits = tagged.groupBy(*key).agg(
        F.array_sort(F.collect_list(F.struct("pos", "term"))).alias("hits")
    )
    h = F.col("hits")
    # per candidate start s (every hit position): distinct terms covered
    # by [s, s+window); argmax by (count, -s) via lexicographic max over
    # a struct — ties prefer the earliest start
    cand = F.transform(
        h,
        lambda x: F.struct(
            F.size(
                F.array_distinct(
                    F.transform(
                        F.filter(
                            h,
                            lambda y: (y["pos"] >= x["pos"])
                            & (y["pos"] < x["pos"] + window),
                        ),
                        lambda y: y["term"],
                    )
                )
            ).alias("cnt"),
            (-x["pos"]).alias("negs"),
        ),
    )
    best = hits.select(*key, F.array_max(cand).alias("best")).select(
        *key,
        (-F.col("best.negs")).cast("long").alias("snip_start"),
        F.col("best.cnt").cast("long").alias("n_terms"),
    )
    # snippet text from the kept-token stream (positions live in that
    # space); corpus pruned to the k matched keys before tokenizing
    toked = (
        docs.join(F.broadcast(top.select(*key)), key, "left_semi")
        .select(*key, tokenize_col(F.col(text_col)).alias("_toks"))
    )
    snip = best.join(F.broadcast(toked), key).select(
        *key, "snip_start", "n_terms",
        F.array_join(
            F.slice(F.col("_toks"), F.col("snip_start") + 1, window), " "
        ).alias("snippet"),
    )
    return top.join(F.broadcast(snip), key, "left").select(
        *key, "score", "snip_start", "n_terms", "snippet"
    )

"""Driver-contract queries + matching DuckDB oracle SQL.

Each entry here is one operator family from SURVEY.md §2, expressed twice:
as the engine's DataFrame program (run by Spark) and as ANSI SQL (run by
DuckDB on the same parquet) — the driver hash-compares the results at
sf=0.01. Column names/aliases match exactly on both sides; float columns
are rounded identically.

The search-engine queries run over the `documents` table (doc_id is the
document key; this is the urlid analog). They run UNSTEMMED so the oracle
is SQL-expressible — Porter-stemmed behavior is covered by the pytest
oracle (tests/test_index_parity.py), which the driver also runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.index_build import InvertedIndex, build_index
from .operators.scoring import bm25_topk, tfidf_ref_topk

# ---------------------------------------------------------------- helpers

_INDEX_CACHE: dict[str, InvertedIndex] = {}

BM25_QUERY = "hash join merge"
TFIDF_QUERY = "window sort"
SEMI_TERMS = ("stream", "batch", "shuffle")


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def get_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """Unstemmed index over `documents`, cached per sf_dir (the driver
    calls every query in one process — build once)."""
    idx = _INDEX_CACHE.get(sf_dir)
    if idx is None:
        docs = load(spark, sf_dir, "documents")
        idx = build_index(docs, doc_key=("doc_id",), text_col="text", stem=False)
        _INDEX_CACHE[sf_dir] = idx
    return idx


# Shared DuckDB CTE: tokenize `documents` with the engine's exact spec.
SQL_TOK = """
WITH d AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_extract_all(lower(text), '[a-z-]+'),
                                    x -> trim(x, '-')), x -> x <> '') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, toks[i] AS term, i - 1 AS pos
  FROM d, unnest(generate_series(1, len(toks))) AS s(i)
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf,
         list_sort(list(pos)) AS positions
  FROM tok GROUP BY doc_id, term
),
ds AS (
  SELECT doc_id, sum(tf)::BIGINT AS doc_len, max(tf)::BIGINT AS max_tf
  FROM postings GROUP BY doc_id
),
tot AS (
  SELECT (SELECT count(*) FROM ds)::DOUBLE AS n_docs,
         (SELECT count(*) FROM postings)::DOUBLE AS n_postings,
         (SELECT sum(doc_len) FROM ds)::DOUBLE / (SELECT count(*) FROM ds) AS avg_len
),
cs AS (
  SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term
)
"""

# ------------------------------------------------------------- queries

def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3/A1: long-form postings with positions (as csv string for a
    hash-stable cross-engine representation)."""
    idx = get_index(spark, sf_dir)
    return idx.postings.select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.array_join(F.col("positions"), ",").alias("positions_csv"),
    )


SQL_POSTINGS = (
    SQL_TOK
    + """
SELECT doc_id, term, tf,
       list_aggr(list_transform(positions, x -> x::VARCHAR), 'string_agg', ',') AS positions_csv
FROM postings
"""
)


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-doc length and max term frequency (id2url.max_count analog)."""
    idx = get_index(spark, sf_dir)
    return idx.doc_stats.select(
        "doc_id",
        F.col("doc_len").cast("long").alias("doc_len"),
        F.col("max_tf").cast("long").alias("max_tf"),
    )


SQL_DOC_STATS = SQL_TOK + "SELECT doc_id, doc_len, max_tf FROM ds"


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5/F5: exact document frequency + both idf variants."""
    idx = get_index(spark, sf_dir)
    return idx.corpus_stats.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.round("idf_ref", 6).alias("idf_ref"),
        F.round("idf_bm25", 6).alias("idf_bm25"),
    )


SQL_CORPUS_STATS = (
    SQL_TOK
    + """
SELECT cs.term, cs.df,
       round(ln(tot.n_postings / cs.df), 6) AS idf_ref,
       round(ln((tot.n_docs - cs.df + 0.5) / (cs.df + 0.5) + 1.0), 6) AS idf_bm25
FROM cs, tot
"""
)


def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: classic word count over all token occurrences (WordCountEMR)."""
    from .operators.index_build import tokenize_turns

    docs = load(spark, sf_dir, "documents")
    toks = tokenize_turns(docs, doc_key=("doc_id",))
    return toks.groupBy(F.col("raw_term").alias("term")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


SQL_WORDCOUNT = SQL_TOK + "SELECT term, count(*)::BIGINT AS cnt FROM tok GROUP BY term"


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A6+T1: BM25 top-80 for a fixed query, deterministic tie-break."""
    idx = get_index(spark, sf_dir)
    out = bm25_topk(idx, BM25_QUERY, k=80, stem=False)
    return out.select("doc_id", F.round("score", 4).alias("score"))


SQL_BM25_TOPK = (
    SQL_TOK
    + f"""
SELECT p.doc_id,
       round(sum(ln((tot.n_docs - cs.df + 0.5) / (cs.df + 0.5) + 1.0)
                 * p.tf * 2.2
                 / (p.tf + 1.2 * (0.25 + 0.75 * ds.doc_len / tot.avg_len))), 4) AS score
FROM postings p, cs, ds, tot
WHERE p.term = cs.term AND p.doc_id = ds.doc_id
  AND p.term IN ('hash', 'join', 'merge')
GROUP BY p.doc_id
ORDER BY sum(ln((tot.n_docs - cs.df + 0.5) / (cs.df + 0.5) + 1.0)
             * p.tf * 2.2
             / (p.tf + 1.2 * (0.25 + 0.75 * ds.doc_len / tot.avg_len))) DESC,
         p.doc_id ASC
LIMIT 80
"""
)


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5/A6/T1: the reference tf-idf ranker, top-80."""
    idx = get_index(spark, sf_dir)
    out = tfidf_ref_topk(idx, TFIDF_QUERY, k=80, stem=False)
    return out.select("doc_id", F.round("score", 4).alias("score"))


SQL_TFIDF_TOPK = (
    SQL_TOK
    + """
SELECT p.doc_id,
       round(sum((1.0 + ln(p.tf)) / (1.0 + ln(ds.max_tf)) * ln(tot.n_postings / cs.df)), 4) AS score
FROM postings p, cs, ds, tot
WHERE p.term = cs.term AND p.doc_id = ds.doc_id
  AND p.term IN ('window', 'sort')
GROUP BY p.doc_id
ORDER BY sum((1.0 + ln(p.tf)) / (1.0 + ln(ds.max_tf)) * ln(tot.n_postings / cs.df)) DESC,
         p.doc_id ASC
LIMIT 80
"""
)


def q_term_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: posting ∩ query-terms semi-join -> matching documents."""
    idx = get_index(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in SEMI_TERMS], "term string")
    matched = idx.postings.join(F.broadcast(terms), "term", "left_semi")
    hit_docs = matched.select("doc_id").distinct()
    return docs.join(hit_docs, "doc_id", "left_semi").select("doc_id", "lang", "source")


SQL_TERM_SEMI_JOIN = (
    SQL_TOK
    + f"""
SELECT doc_id, lang, source FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM postings
                 WHERE term IN ('stream', 'batch', 'shuffle'))
"""
)


def q_topk_join_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: top-k scores LEFT-joined back to the document registry."""
    idx = get_index(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    top = bm25_topk(idx, BM25_QUERY, k=20, stem=False)
    return (
        top.join(docs.select("doc_id", "lang", "source"), "doc_id", "left")
        .select("doc_id", F.round("score", 4).alias("score"), "lang", "source")
    )


SQL_TOPK_JOIN_META = (
    SQL_TOK
    + """
, top AS (
  SELECT p.doc_id,
         sum(ln((tot.n_docs - cs.df + 0.5) / (cs.df + 0.5) + 1.0)
             * p.tf * 2.2
             / (p.tf + 1.2 * (0.25 + 0.75 * ds.doc_len / tot.avg_len))) AS score
  FROM postings p, cs, ds, tot
  WHERE p.term = cs.term AND p.doc_id = ds.doc_id
    AND p.term IN ('hash', 'join', 'merge')
  GROUP BY p.doc_id
  ORDER BY score DESC, p.doc_id ASC
  LIMIT 20
)
SELECT t.doc_id, round(t.score, 4) AS score, d2.lang, d2.source
FROM top t LEFT JOIN documents d2 ON t.doc_id = d2.doc_id
"""
)


def q_prior_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/F3: score + 0.5*coalesce(prior, 0) — the pagerank-blend analog
    (SearchHelper.java:157,182). Prior is a deterministic function of
    doc_id, defined only for doc_id % 3 == 0 so the LEFT join + coalesce
    path is actually exercised."""
    idx = get_index(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    prior = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", ((F.col("doc_id") % 7).cast("double") / 2.0).alias("rank"))
    )
    out = tfidf_ref_topk(idx, TFIDF_QUERY, k=40, prior=prior, stem=False)
    return out.select("doc_id", F.round("score", 4).alias("score"))


SQL_PRIOR_BLEND = (
    SQL_TOK
    + """
, base AS (
  SELECT p.doc_id,
         sum((1.0 + ln(p.tf)) / (1.0 + ln(ds.max_tf)) * ln(tot.n_postings / cs.df)) AS score
  FROM postings p, cs, ds, tot
  WHERE p.term = cs.term AND p.doc_id = ds.doc_id
    AND p.term IN ('window', 'sort')
  GROUP BY p.doc_id
),
blend AS (
  SELECT b.doc_id,
         b.score + 0.5 * coalesce(pr.rank, 0.0) AS score
  FROM base b
  LEFT JOIN (SELECT doc_id, (doc_id % 7)::DOUBLE / 2.0 AS rank
             FROM documents WHERE doc_id % 3 = 0) pr
    ON b.doc_id = pr.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM blend ORDER BY score DESC, doc_id ASC LIMIT 40
"""
)


# ------------------------------------------------ relational coverage

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation over lineitem (scan + filter + hash agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + agg + top-10 (broadcastable dims)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey
ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey ASC
LIMIT 10
"""


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window aggregation over the events stream table
    (the batch shape of the Structured-Streaming path)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SQL_EVENTS_WINDOW = """
SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------- registry

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "postings": q_postings,
    "doc_stats": q_doc_stats,
    "corpus_stats": q_corpus_stats,
    "wordcount": q_wordcount,
    "bm25_topk": q_bm25_topk,
    "tfidf_topk": q_tfidf_topk,
    "term_semi_join": q_term_semi_join,
    "topk_join_meta": q_topk_join_meta,
    "prior_blend": q_prior_blend,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "events_window": q_events_window,
}

ORACLES: dict[str, str] = {
    "postings": SQL_POSTINGS,
    "doc_stats": SQL_DOC_STATS,
    "corpus_stats": SQL_CORPUS_STATS,
    "wordcount": SQL_WORDCOUNT,
    "bm25_topk": SQL_BM25_TOPK,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "term_semi_join": SQL_TERM_SEMI_JOIN,
    "topk_join_meta": SQL_TOPK_JOIN_META,
    "prior_blend": SQL_PRIOR_BLEND,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "events_window": SQL_EVENTS_WINDOW,
}

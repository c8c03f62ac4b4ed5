"""Ranking-quality evaluation: nDCG@k / MRR@k / P@k / R@k over a run.

The reference repo ships a ranker but no evaluation harness — its
quality claims are the report's hand-checked query screenshots
(SURVEY.md §5). A production search/retrieval pipeline evaluates every
ranker change against graded relevance judgments (qrels) before
shipping; at training-data scale the same operator scores retrieval
quality over MILLIONS of logged queries, so it must be a distributed
column program, not a driver-side loop over queries (trec_eval-style
tools are per-file, single-threaded).

Definitions are the standard public ones (Järvelin & Kekäläinen, TOIS
2002 for nDCG; TREC for MRR/P/R):

- rank        = row_number over (score DESC, doc_key ASC) per query
- DCG@k       = Σ_{rank≤k} (2^grade − 1) / log2(rank + 1)
- IDCG@k      = DCG of the ideal ordering (qrels sorted by grade DESC)
- nDCG@k      = DCG/IDCG  (0 when the query has no relevant docs)
- MRR@k       = 1/rank of the first doc with grade ≥ 1 in the top-k
- P@k         = |{top-k docs with grade ≥ 1}| / k
- R@k         = |{top-k docs with grade ≥ 1}| / |{docs with grade ≥ 1}|

Everything is two windows partitioned by qid (#queries >> cores ⇒
skew-free) plus hash aggs on qid; the run⋈qrels join is a plain
equi-join on (qid, doc_key) — both sides unbounded, neither broadcast.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coverage_qrels(
    postings: DataFrame,
    queries: dict[str, str],
    stem: bool = True,
    doc_key: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Deterministic term-coverage relevance judgments for a query
    batch: grade 2 = the doc contains ALL of the query's terms, grade
    1 = at least half — the one definition shared by the driver query,
    its SQL twin's CASE, and the scale demos. Returns
    (qid, doc_key..., grade) with grade ≥ 1 rows only.

    Plan: postings filtered to the batch's terms (pushdown), joined to
    the tiny broadcast (qid, term, nt) frame, one hash agg keyed by
    (qid, doc) — the same shape as the batch scorer's scoring agg.
    """
    from .scoring import query_term_pairs

    key = list(doc_key)
    pairs = query_term_pairs(queries, stem=stem)
    spark = postings.sparkSession
    qdf = spark.createDataFrame(pairs, "qid string, term string, nt int")
    all_terms = sorted({t for _, t, _ in pairs})
    return (
        postings.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qdf), "term")
        .groupBy("qid", *key)
        .agg(F.count_distinct("term").alias("hit"), F.first("nt").alias("nt"))
        .select(
            "qid",
            *key,
            F.when(F.col("hit") == F.col("nt"), 2)
            .when(2 * F.col("hit") >= F.col("nt"), 1)
            .otherwise(0)
            .alias("grade"),
        )
        .filter(F.col("grade") > 0)
    )


def rank_eval(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    qid_col: str = "qid",
    doc_key: Sequence[str] = ("doc_id",),
    score_col: str = "score",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query retrieval metrics for ``run`` against ``qrels``.

    ``run``:   (qid_col, doc_key..., score_col) — a ranked candidate
               list per query (extra rows beyond k are ignored).
    ``qrels``: (qid_col, doc_key..., grade_col) — integer grades ≥ 0;
               grade ≥ 1 counts as relevant, graded gains feed nDCG.

    Returns (qid, ndcg, mrr, p_at_k, r_at_k), one row per qid present
    in the run, metrics rounded to 4 dp. Queries absent from qrels get
    ndcg = mrr = p = r = 0.
    """
    key = list(doc_key)
    rel = qrels.filter(F.col(grade_col) >= 1).select(
        qid_col, *key, F.col(grade_col).alias("g")
    )

    w_run = Window.partitionBy(qid_col).orderBy(
        F.desc(score_col), *[F.asc(c) for c in key]
    )
    top = (
        run.withColumn("rank", F.row_number().over(w_run))
        .filter(F.col("rank") <= k)
        .join(rel, [qid_col, *key], "left")
        .withColumn("g", F.coalesce(F.col("g"), F.lit(0)))
    )
    per = top.groupBy(qid_col).agg(
        F.sum((F.pow(F.lit(2.0), F.col("g")) - 1.0) / F.log2(F.col("rank") + 1.0)).alias("dcg"),
        F.max(F.when(F.col("g") >= 1, 1.0 / F.col("rank"))).alias("mrr0"),
        F.sum(F.when(F.col("g") >= 1, 1).otherwise(0)).cast("double").alias("nhit"),
    )

    w_ideal = Window.partitionBy(qid_col).orderBy(
        F.desc("g"), *[F.asc(c) for c in key]
    )
    idcg = (
        rel.withColumn("irank", F.row_number().over(w_ideal))
        .filter(F.col("irank") <= k)
        .groupBy(qid_col)
        .agg(
            F.sum((F.pow(F.lit(2.0), F.col("g")) - 1.0) / F.log2(F.col("irank") + 1.0)).alias("idcg")
        )
    )
    nrel = rel.groupBy(qid_col).agg(F.count(F.lit(1)).cast("double").alias("n_rel"))

    return (
        per.join(idcg, qid_col, "left")
        .join(nrel, qid_col, "left")
        .select(
            qid_col,
            F.round(
                F.when(F.coalesce(F.col("idcg"), F.lit(0.0)) > 0, F.col("dcg") / F.col("idcg"))
                .otherwise(F.lit(0.0)),
                4,
            ).alias("ndcg"),
            F.round(F.coalesce(F.col("mrr0"), F.lit(0.0)), 4).alias("mrr"),
            F.round(F.col("nhit") / F.lit(float(k)), 4).alias("p_at_k"),
            F.round(
                F.when(F.coalesce(F.col("n_rel"), F.lit(0.0)) > 0, F.col("nhit") / F.col("n_rel"))
                .otherwise(F.lit(0.0)),
                4,
            ).alias("r_at_k"),
        )
    )

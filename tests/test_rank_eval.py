"""BM25F, evidence aggregation, and rank_eval vs pure-Python recomputation.

Same strategy as the rest of the suite (SURVEY.md §5): every Spark
operator is re-derived independently in plain Python over the oracle
index / hand-built frames and compared value-for-value.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

K1, B = 1.2, 0.75

QUERY = "zoom weather university"


def _stemmed_terms(query):
    from cis555_search_engine_spark.operators.scoring import bm25_query_terms

    return bm25_query_terms(query)


def test_bm25f_matches_python(spark, spark_index, oracle_index, corpus_pdf, corpus_sdf):
    from cis555_search_engine_spark.operators.scoring import bm25f_scores

    weights = {"user": 1.0, "assistant": 2.0, "tool": 0.5}
    doc_fields = corpus_sdf.select(
        "conv_id", "turn_idx", F.col("conv_id").alias("grp"), "role"
    )
    got = {
        r["grp"]: r["score"]
        for r in bm25f_scores(
            spark_index, QUERY, doc_fields, weights,
            group_col="grp", field_col="role",
        ).collect()
    }

    # ---- pure-Python recomputation over the oracle index ----
    role_of = {
        (r.conv_id, r.turn_idx): r.role
        for r in corpus_pdf.itertuples(index=False)
    }
    terms = _stemmed_terms(QUERY)
    flen: dict[tuple[str, str], float] = defaultdict(float)
    for key, dl in oracle_index.doc_len.items():
        flen[(key[0], role_of[key])] += dl
    per_role: dict[str, list[float]] = defaultdict(list)
    for (g, f), v in flen.items():
        per_role[f].append(v)
    avg_f = {f: sum(v) / len(v) for f, v in per_role.items()}

    tf_gft: dict[tuple[str, str, str], float] = defaultdict(float)
    for key, tf in oracle_index.doc_tf.items():
        for t in terms:
            if tf.get(t):
                tf_gft[(key[0], role_of[key], t)] += tf[t]
    groups = {key[0] for key in oracle_index.doc_len}
    n_g = float(len(groups))
    df_g = {t: len({g for (g, f, tt) in tf_gft if tt == t}) for t in terms}

    tfw: dict[tuple[str, str], float] = defaultdict(float)
    for (g, f, t), v in tf_gft.items():
        tfw[(g, t)] += weights[f] * v / (1 - B + B * flen[(g, f)] / avg_f[f])
    want: dict[str, float] = defaultdict(float)
    for (g, t), v in tfw.items():
        idf = math.log((n_g - df_g[t] + 0.5) / (df_g[t] + 0.5) + 1.0)
        want[g] += idf * v / (K1 + v)

    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], rel=1e-9)


def test_evidence_scores_matches_python(spark):
    from cis555_search_engine_spark.operators.scoring import evidence_scores

    rows = [
        # (doc_id, score, grp): grp 0 has 3 turns, grp 1 has 1, grp 2 ties
        (1, 5.0, 0), (2, 4.0, 0), (3, 1.0, 0),
        (4, 2.5, 1),
        (5, 3.0, 2), (6, 3.0, 2), (7, 3.0, 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, grp long")
    got = {
        r["grp"]: (r["score"], r["best_doc_id"])
        for r in evidence_scores(df, doc_key=["doc_id"], group_col="grp", m=2).collect()
    }
    # top-2 per group, ties broken by doc_id asc; best = rank-1 doc
    assert got[0] == (9.0, 1)
    assert got[1] == (2.5, 4)
    assert got[2] == (6.0, 5)  # docs 5,6 win the tie over 7


def test_rank_eval_matches_hand_math(spark):
    from cis555_search_engine_spark.operators.rank_eval import rank_eval

    run = spark.createDataFrame(
        [("q1", d, s) for d, s in [(1, 5.0), (2, 4.0), (3, 3.0), (4, 2.0), (5, 1.0)]]
        + [("q2", 1, 9.0), ("q2", 2, 8.0)],
        "qid string, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [("q1", 2, 2), ("q1", 4, 1), ("q1", 9, 1)],
        "qid string, doc_id long, grade int",
    )
    got = {r["qid"]: r for r in rank_eval(run, qrels, k=3).collect()}

    # q1 top-3 = d1(g0), d2(g2), d3(g0)
    dcg = (2**2 - 1) / math.log2(3)
    idcg = (2**2 - 1) / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert got["q1"]["ndcg"] == pytest.approx(round(dcg / idcg, 4))
    assert got["q1"]["mrr"] == pytest.approx(0.5)
    assert got["q1"]["p_at_k"] == pytest.approx(round(1 / 3, 4))
    assert got["q1"]["r_at_k"] == pytest.approx(round(1 / 3, 4))
    # q2 has no judged docs at all -> all zeros
    assert (got["q2"]["ndcg"], got["q2"]["mrr"], got["q2"]["p_at_k"], got["q2"]["r_at_k"]) == (
        0.0, 0.0, 0.0, 0.0,
    )


def test_new_rankers_stay_jvm_side(spark, spark_index, corpus_sdf):
    """No row-at-a-time Python in any of the three new plans."""
    from cis555_search_engine_spark.operators.rank_eval import rank_eval
    from cis555_search_engine_spark.operators.scoring import bm25f_scores, evidence_scores

    from tests.test_plans import explain_str

    doc_fields = corpus_sdf.select(
        "conv_id", "turn_idx", F.col("conv_id").alias("grp"), "role"
    )
    plans = [
        explain_str(
            bm25f_scores(
                spark_index, QUERY, doc_fields,
                {"user": 1.0, "assistant": 2.0, "tool": 0.5},
                group_col="grp", field_col="role",
            )
        ),
        explain_str(
            evidence_scores(
                spark.createDataFrame([(1, 1.0, 0)], "doc_id long, score double, grp long"),
                doc_key=["doc_id"], group_col="grp", m=2,
            )
        ),
        explain_str(
            rank_eval(
                spark.createDataFrame([("q", 1, 1.0)], "qid string, doc_id long, score double"),
                spark.createDataFrame([("q", 1, 1)], "qid string, doc_id long, grade int"),
            )
        ),
    ]
    for p in plans:
        assert "BatchEvalPython" not in p

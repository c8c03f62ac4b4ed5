#!/usr/bin/env python
"""Scale demo for the late-round-5 operators on the scaling corpus
(1,583,720 turns at the scaling_bench default of 12,000 convs × 8
replicas).

Reuses the corpus staged by tools/scaling_bench.py (pass
--corpus /tmp/scaling_bench/corpus) — REAL conv_id/role fields, so BM25F and the
evidence aggregation run on native conversation structure, not the
documents-table modulo view. The PQ demo synthesizes 200k clustered
64-dim vectors columnar-side (no driver materialization).

    PYTHONPATH=. python tools/demo_round5_ops.py [--corpus /tmp/scaling_bench]

Prints one timing line per operator (warm median of 3, consuming
collect), formatted for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, runs: int = 3) -> tuple[float, object]:
    vals, out = [], None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        vals.append(time.perf_counter() - t0)
    return statistics.median(vals), out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/scaling_bench")
    ap.add_argument("--n-vecs", type=int, default=200_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cis555_search_engine_spark.operators.index_build import build_index
    from cis555_search_engine_spark.operators.rank_eval import rank_eval
    from cis555_search_engine_spark.operators.scoring import (
        bm25_scores,
        bm25_topk_many,
        bm25f_scores,
        evidence_scores,
    )
    from cis555_search_engine_spark.operators.similarity import (
        ann_topk_bruteforce,
        pq_encode,
        pq_shortlist,
        pq_topk,
        pq_train,
    )
    from cis555_search_engine_spark.session import get_spark
    from cis555_search_engine_spark.synth import REFERENCE_QUERIES

    spark = get_spark("demo-r5", cores=16, shuffle_partitions=128)
    corpus = spark.read.parquet(args.corpus)
    n = corpus.count()
    print(f"corpus: {n:,} turns from {args.corpus}")

    t0 = time.perf_counter()
    idx = build_index(corpus)
    idx.postings.count()
    print(f"index build+cache: {time.perf_counter()-t0:.1f}s")

    # --- BM25F over REAL conversation/role fields ---
    fields = corpus.select("conv_id", "turn_idx",
                           F.col("conv_id").alias("grp"), "role")
    weights = {"user": 1.0, "assistant": 2.0, "tool": 0.5}

    def _bm25f():
        return (
            bm25f_scores(idx, "rice noodle", fields, weights,
                         group_col="grp", field_col="role")
            .orderBy(F.desc("score"), F.asc("grp")).limit(20).collect()
        )

    med, out = timeit(_bm25f)
    print(f"bm25f_topk (k=20 convs): median {med:.2f}s, top score {out[0]['score']:.4f}")

    # --- turn->conversation evidence aggregation ---
    def _conv():
        sc = bm25_scores(idx, "rice noodle").withColumn("grp", F.col("conv_id"))
        return (
            evidence_scores(sc, doc_key=["conv_id", "turn_idx"], group_col="grp", m=2)
            .orderBy(F.desc("score"), F.asc("grp")).limit(10).collect()
        )

    med, out = timeit(_conv)
    print(f"conv_topk (SumP m=2, k=10): median {med:.2f}s")

    # --- rank evaluation over the 21-query reference batch ---
    from cis555_search_engine_spark.operators.rank_eval import coverage_qrels

    queries = {f"q{i:02d}": q for i, q in enumerate(REFERENCE_QUERIES)}

    def _metrics():
        run = bm25_topk_many(idx, queries, k=10)
        qrels = coverage_qrels(idx.postings, queries,
                               doc_key=("conv_id", "turn_idx"))
        return rank_eval(run, qrels, k=10,
                         doc_key=("conv_id", "turn_idx")).orderBy("qid").collect()

    med, rows = timeit(_metrics)
    mean_ndcg = sum(r["ndcg"] for r in rows) / len(rows)
    print(f"rank_metrics (21 queries, nDCG/MRR/P/R@10 over {n:,} turns): "
          f"median {med:.2f}s, mean nDCG {mean_ndcg:.3f}")

    # --- BPE vocabulary induction over the full-corpus wordcount ---
    from cis555_search_engine_spark.operators.bpe import bpe_train
    from cis555_search_engine_spark.operators.index_build import tokenize_turns

    t0 = time.perf_counter()
    wc = (
        tokenize_turns(corpus)
        .groupBy(F.col("raw_term").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    nw = wc.count()
    t_wc = time.perf_counter() - t0
    t0 = time.perf_counter()
    mrows = bpe_train(wc, n_merges=10).collect()
    t_bpe = time.perf_counter() - t0
    print(f"bpe_merges (10 merges over {nw:,} distinct words from {n:,} turns): "
          f"wordcount {t_wc:.1f}s + train {t_bpe:.1f}s; "
          f"top merge {mrows[0]['merged']!r} cnt {mrows[0]['cnt']:,}")

    # --- PQ at 200k vectors (clustered, synthesized columnar-side) ---
    nv = args.n_vecs
    emb = (
        spark.range(nv)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    F.cos((F.col("id") % 50) * i.cast("double"))
                    + 0.2 * F.sin(F.col("id") * i.cast("double"))
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(64)
        .cache()
    )
    emb.count()

    t0 = time.perf_counter()
    books = pq_train(emb, m=8, ks=8, n_iter=2)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    codes = pq_encode(emb, books).cache()
    nc = codes.count()
    t_enc = time.perf_counter() - t0
    print(f"pq_train (m=8 ks=8 2 iters, {nv:,} vecs): {t_train:.1f}s; "
          f"pq_encode: {t_enc:.1f}s ({nc/t_enc/1000:.0f}k vecs/s)")

    # shortlist at the standard ~1%-of-corpus operating point: ADC is a
    # cluster-resolution ranker, so a sub-cluster-size shortlist cannot
    # recover noise-level exact ranks (measured: 100/200k -> recall 0.1,
    # 2000/200k -> recall 1.0 on this corpus)
    L = max(100, nv // 100)

    def _sweep():
        return pq_shortlist(emb, 7, shortlist=L,
                            codebooks=books, codes=codes).collect()

    med, _ = timeit(_sweep)
    print(f"ADC shortlist sweep (codes only, top-{L} of {nv:,}): median {med:.2f}s")

    def _full():
        return pq_topk(emb, 7, k=10, shortlist=L,
                       codebooks=books, codes=codes).collect()

    med, got = timeit(_full)
    brute = [r["vec_id"] for r in ann_topk_bruteforce(emb, 7, k=10).collect()]
    rec = len({r["vec_id"] for r in got} & set(brute)) / 10
    med_b, _ = timeit(lambda: ann_topk_bruteforce(emb, 7, k=10).collect())
    print(f"pq_topk ADC+exact-rerank: median {med:.2f}s, recall@10 {rec:.2f} "
          f"(brute-force exact: {med_b:.2f}s)")


if __name__ == "__main__":
    main()

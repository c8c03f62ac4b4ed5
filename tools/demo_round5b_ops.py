#!/usr/bin/env python
"""Scale demo for the round-5b operators — sliding-window chunking,
winnowing fingerprints/pairs, permuterm wildcards, next-word suggestion,
and the tiered segment-merge policy — on the scaling corpus (default
1,583,720 turns: 12,000 convs × 8 replicas, the scaling_bench layout).

    PYTHONPATH=. python tools/demo_round5b_ops.py \
        [--corpus /tmp/scaling_bench/corpus] [--n-convs 12000] \
        [--segments 8] [--skip-merge]

Stages the corpus if absent (same generator + replication as
tools/scaling_bench.py). Prints one timing line per operator (warm
median of 3 where cheap, single run for the build-scale legs),
formatted for BENCH/BASELINE.md.

Disclosure baked into the numbers: the 8× replication makes the
winnowing-pairs leg the structural WORST case (every turn's 7 replicas
share ALL fingerprints), so the hot-hash cap and the pair join both do
maximal work per doc; a real corpus does far less.
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
    ap.add_argument("--corpus", default="/tmp/scaling_bench/corpus")
    ap.add_argument("--n-convs", type=int, default=12_000)
    ap.add_argument("--segments", type=int, default=8,
                    help="segment count for the tiered-merge leg")
    ap.add_argument("--skip-merge", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cis555_search_engine_spark.operators.curation import chunk_windows
    from cis555_search_engine_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )
    from cis555_search_engine_spark.operators.index_build import build_index
    from cis555_search_engine_spark.operators.query_ops import (
        next_word_suggest,
        wildcard_topk,
    )
    from cis555_search_engine_spark.session import get_spark

    if not os.path.exists(args.corpus):
        # stage BEFORE opening this job's session: stage_corpus manages
        # (and stops) its own SparkSession
        from tools.scaling_bench import stage_corpus

        print(f"# staging corpus n_convs={args.n_convs} ...", file=sys.stderr)
        stage_corpus(args.corpus, args.n_convs)

    spark = get_spark("demo-r5b", cores=16, shuffle_partitions=128)
    corpus = spark.read.parquet(args.corpus)
    n = corpus.count()
    print(f"corpus: {n:,} turns from {args.corpus}")

    docs = corpus.select(
        F.concat_ws(":", "conv_id", "turn_idx").alias("doc_id"), "text"
    )

    # --- chunking: force full materialization of every chunk text ---
    t, out = timeit(
        lambda: chunk_windows(docs, window=64, stride=48)
        .agg(F.count(F.lit(1)), F.sum(F.length("chunk_text")), F.sum("n_tokens"))
        .collect(),
        runs=3,
    )
    n_chunks, n_chars, n_toks = out[0]
    print(
        f"chunk_windows(64/48): {t:.1f}s median -> {n_chunks:,} chunks, "
        f"{int(n_toks):,} tokens, {n / t:,.0f} turns/s"
    )

    # --- winnowing fingerprints: full aggregate over selected prints ---
    t, out = timeit(
        lambda: winnow_fingerprints(docs, k=4, w=5)
        .agg(F.count(F.lit(1)), F.count_distinct("ghash"))
        .collect(),
        runs=3,
    )
    n_fp, n_uni = out[0]
    print(
        f"winnow_fingerprints(4,5): {t:.1f}s median -> {n_fp:,} prints "
        f"({n_uni:,} distinct hashes), {n / t:,.0f} turns/s"
    )

    # --- winnowing near-dup pairs (replica-heavy worst case) ---
    t0 = time.perf_counter()
    n_pairs = winnow_pairs(docs, threshold=0.9, k=4, w=5).count()
    t = time.perf_counter() - t0
    print(
        f"winnow_pairs(0.9): {t:.1f}s -> {n_pairs:,} pairs "
        f"(8x-replica worst case), {n / t:,.0f} turns/s"
    )

    # --- index-served queries on the full-corpus index ---
    t0 = time.perf_counter()
    idx = build_index(corpus)
    idx.postings.count()
    print(f"index build+cache: {time.perf_counter() - t0:.1f}s")

    t, out = timeit(lambda: next_word_suggest(idx, "rice", k=10).collect(), runs=3)
    print(f"next_word_suggest('rice'): {t:.2f}s median -> top={out[0]['term']!r}")

    t, out = timeit(lambda: wildcard_topk(idx, "nood*", k=40).collect(), runs=3)
    print(f"wildcard_topk('nood*'): {t:.2f}s median -> {len(out)} docs")

    if not args.skip_merge:
        # --- tiered merge at segment scale: S segments of ~n/S turns ---
        import shutil

        from cis555_search_engine_spark.operators.postings_codec import (
            _manifest_dirs,
            _read_meta,
            append_blocks,
            bm25_topk_blocks,
            build_blocks,
            load_blocks,
            tiered_merge,
            write_blocks,
        )

        path = "/tmp/demo_r5b_store"
        shutil.rmtree(path, ignore_errors=True)
        S = args.segments
        parts = [
            corpus.filter(F.crc32(F.col("conv_id").cast("binary")) % S == i)
            for i in range(S)
        ]
        t0 = time.perf_counter()
        write_blocks(
            build_blocks(build_index(parts[0], cache="checkpoint"),
                         block_span=4096),
            path, n_buckets=64,
        )
        for p in parts[1:]:
            append_blocks(spark, path, build_index(p, cache="checkpoint"))
        t_build = time.perf_counter() - t0
        n_dirs0 = len(_manifest_dirs(_read_meta(spark, path)))
        t0 = time.perf_counter()
        n_merges = tiered_merge(spark, path, merge_at=2)
        t_merge = time.perf_counter() - t0
        n_dirs1 = len(_manifest_dirs(_read_meta(spark, path)))
        print(
            f"tiered_merge: {S}-segment store built in {t_build:.1f}s; "
            f"{n_merges} merges in {t_merge:.1f}s, {n_dirs0} -> {n_dirs1} "
            f"segments ({n / t_merge:,.0f} turns/s merge throughput)"
        )
        bidx = load_blocks(spark, path)
        t, out = timeit(
            lambda: bm25_topk_blocks(bidx, "rice noodle", k=10).collect(), runs=3
        )
        print(f"bm25 over merged store: {t:.2f}s median, {len(out)} rows")

    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""spark-submit entry: full inverted-index build over a transcript corpus.

    spark-submit --master local[N] --py-files pkg.zip \
        tools/index_build_job.py --corpus <parquet> --out <dir>

Reads the corpus, builds long postings (tokenize -> stem -> TF+positions),
doc stats and corpus stats, writes them to <out>, and prints ONE JSON
line with build wall-time and throughput (turns-indexed/sec) — the
north-rule metric. JVM/session startup is excluded from build_s (we time
from first action), and reported separately.

This is the job `tools/scaling_bench.py` launches at two parallelism
levels to evidence scaling efficiency (the sandbox proxy for N vs 4N
executors — the reference's own 4-vs-6-core pagerank experiment is the
template, report p.6).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    t_start = time.perf_counter()
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("index_build_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # always use the sort-based shuffle writer: the bypass-merge
        # writer opens one file per reduce partition per map task, which
        # thrashes at high local parallelism (and would on dense
        # multi-core executors too)
        .config("spark.shuffle.sort.bypassMergeThreshold", "2")
    )
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    t_session = time.perf_counter()

    from cis555_search_engine_spark.operators.index_build import (
        build_postings_doclocal,
        corpus_stats,
        doc_stats,
    )

    corpus = spark.read.parquet(args.corpus)

    # warmup: run the same pipeline on a small slice so codegen/JIT and
    # Python-worker startup are excluded from the measured build
    warm = corpus.limit(2000)
    build_postings_doclocal(warm, stem=not args.no_stem).write.mode("overwrite").parquet(
        f"{args.out}/_warmup"
    )

    phases: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        t1 = time.perf_counter()
        phases[name] = round(t1 - t0, 3)
        return t1

    t0 = time.perf_counter()
    t_build0 = t0
    postings = build_postings_doclocal(corpus, stem=not args.no_stem)
    postings.write.mode("overwrite").parquet(f"{args.out}/postings_long")
    t0 = mark("postings_write", t0)
    postings = spark.read.parquet(f"{args.out}/postings_long")
    stats = doc_stats(postings)
    stats.write.mode("overwrite").parquet(f"{args.out}/doc_stats")
    t0 = mark("doc_stats_write", t0)
    n_docs = stats.count()
    n_postings = postings.count()
    t0 = mark("totals", t0)
    cstats = corpus_stats(postings, n_docs, n_postings)
    cstats.write.mode("overwrite").parquet(f"{args.out}/corpus_stats")
    t0 = mark("corpus_stats_write", t0)
    build_s = time.perf_counter() - t_build0

    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "n_postings": n_postings,
                "build_s": round(build_s, 3),
                "docs_per_sec": round(n_docs / build_s, 2),
                "phases": phases,
                "session_startup_s": round(t_session - t_start, 3),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()

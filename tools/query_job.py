#!/usr/bin/env python
"""spark-submit entry: serve queries against a built index directory.

    spark-submit --master local[N] --py-files pkg.zip tools/query_job.py \
        --index <dir-from-index_build_job-or-checkpointed-build> \
        --query "rice noodle" [--k 10] [--ranker bm25|tfidf|cosine] \
        [--mode or|and] [--blocks]

Prints one JSON line per result row plus a trailing latency line — the
spark-submit twin of the reference's HTTP frontend
(frontend/XPathApp.java -> SearchHelper.SearchByKeywords).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--ranker", default="bm25", choices=["bm25", "tfidf", "cosine"])
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--blocks", action="store_true", help="serve from compressed block index")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("query_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cis555_search_engine_spark.engine import SearchEngine

    eng = SearchEngine.load(spark, args.index)
    t0 = time.perf_counter()
    if args.blocks:
        df = eng.search_blocks(args.query, k=args.k, mode=args.mode)
    else:
        df = eng.search(args.query, k=args.k, ranker=args.ranker, mode=args.mode)
    rows = df.collect()
    latency = time.perf_counter() - t0
    for r in rows:
        print(json.dumps(r.asDict()))
    print(json.dumps({"latency_s": round(latency, 3), "n_results": len(rows)}))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()

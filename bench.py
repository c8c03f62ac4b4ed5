#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line::

    {"metric": "e2e_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

``index_build`` is timed separately (cold build + full materialization of
postings/doc-stats/corpus-stats) so the per-query timings measure query
execution, not index construction — mirroring the reference's split between
indexing throughput (report p.3) and query latency (report p.6-7).

Optional: ``--scaling`` additionally runs the index build at two
parallelism levels (local[8] vs local[32] by default) in separate JVMs via
subprocess and reports throughput + scaling efficiency (the sandbox proxy
for the north rule's N vs 4N executors experiment).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from cis555_search_engine_spark.session import get_spark
    from cis555_search_engine_spark import entry_queries as EQ
    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)

    timings: dict[str, float] = {}

    # ---- warmup: tiny pipeline run so codegen/JIT + Python-worker
    # startup don't pollute the first measured number
    from cis555_search_engine_spark.operators.index_build import build_postings_doclocal

    warm = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    build_postings_doclocal(warm, doc_key=("doc_id",), stem=False).count()

    # ---- index build over `documents` (the engine's core artifact) ----
    t0 = time.perf_counter()
    idx = EQ.get_index(spark, sf_dir)
    n_post = idx.postings.count()  # forces full materialization
    idx.doc_stats.count()
    idx.corpus_stats.count()
    build_s = time.perf_counter() - t0
    timings["index_build"] = round(build_s, 3)

    # ---- block-index build + persist (bucketed parquet layout) ---------
    # timed separately so `bm25_blocks` below measures SERVING from the
    # persisted index (the reference's index-once/query-many split) —
    # round 1 folded the whole in-memory rebuild into the query time.
    import shutil

    t0 = time.perf_counter()
    shutil.rmtree(EQ._block_index_path(sf_dir), ignore_errors=True)  # force cold build
    EQ.ensure_block_index(spark, sf_dir)
    timings["blocks_build"] = round(time.perf_counter() - t0, 3)

    # incremental half+half build + append, timed as its own build phase
    # (the bm25_append_blocks query below then measures serving)
    t0 = time.perf_counter()
    EQ.q_bm25_append_blocks(spark, sf_dir).count()
    timings["append_build"] = round(time.perf_counter() - t0, 3)

    # ---- per-query timings (index now cached) ---------------------------
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "e2e_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
        "index_docs": idx.n_docs,
        "index_postings": n_post,
        "docs_per_sec": round(idx.n_docs / build_s, 1) if build_s else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

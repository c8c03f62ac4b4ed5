"""Resumable, checkpointed index build with per-partition lineage.

Reference analog (SURVEY.md §3.2): the indexer resumed by re-running the
same JVM with manual ``start/end/channel`` URL ranges
(``indexer/Indexer.java:305-323``) and idempotent
``ON DUPLICATE KEY UPDATE`` batch INSERTs (``:228-264``); frontier
checkpoints went to BerkeleyDB every 100 docs
(``crawler/XPathCrawler.java:430-440``).

Spark-first redesign: the corpus is split into ``n_groups`` deterministic
slices (``pmod(xxhash64(conv_id), n_groups)`` — every turn of a
conversation stays in one slice). Each slice is tokenized/aggregated and
written to ``<out>/postings_long/group=<g>/`` as an idempotent
overwrite, then a manifest JSON is committed. A killed build re-run with
the same arguments **skips every group whose manifest validates** and
recomputes only the missing ones — the Spark analog of re-running with
the same start/end args, minus the human bookkeeping. On Iceberg the
per-group write maps to ``overwritePartitions()``.

Every stage appends a lineage record to ``<out>/_lineage.jsonl``:
(stage, group, rows, n_docs, wall_s, status, fingerprint) — the north
rule's "lineage and throughput metrics logged per stage".
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_build import (
    DOC_KEY,
    InvertedIndex,
    build_postings_long,
    corpus_stats,
    doc_stats,
)


def _manifest_path(out_dir: str, group: int) -> str:
    return os.path.join(out_dir, "_manifests", f"group_{group:05d}.json")


def _lineage_append(out_dir: str, record: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    record = dict(record, ts=time.time())
    with open(os.path.join(out_dir, "_lineage.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


def _group_col(n_groups: int, conv_col: str = "conv_id"):
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_groups)).cast("int")


def _fingerprint(corpus_slice: DataFrame, doc_key: Sequence[str]) -> dict:
    """Cheap deterministic slice fingerprint: doc count + key hash-sum.
    Detects a changed input without re-reading text bytes."""
    row = corpus_slice.agg(
        F.count(F.lit(1)).alias("rows"),
        # decimal(38,0) so the hash-sum can't hit ANSI long overflow
        F.sum(
            F.xxhash64(*[F.col(c) for c in doc_key]).cast("decimal(38,0)")
        ).alias("keysum"),
    ).collect()[0]
    return {"rows": int(row["rows"] or 0), "keysum": str(row["keysum"] or 0)}


@dataclass
class GroupResult:
    group: int
    status: str  # built | skipped
    rows: int
    wall_s: float


def checkpointed_postings_build(
    corpus: DataFrame,
    out_dir: str,
    n_groups: int = 16,
    doc_key: Sequence[str] = DOC_KEY,
    text_col: str = "text",
    stem: bool = True,
    with_positions: bool = True,
) -> list[GroupResult]:
    """Build long-form postings group-by-group with checkpoint manifests.

    Idempotent: re-running skips validated groups. Returns per-group
    results (also appended to the lineage log).
    """
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    gcol = _group_col(n_groups)
    results: list[GroupResult] = []

    for g in range(n_groups):
        t0 = time.perf_counter()
        mpath = _manifest_path(out_dir, g)
        corpus_g = corpus.filter(gcol == g)
        fp = _fingerprint(corpus_g, doc_key)

        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            if m.get("fingerprint") == fp and m.get("status") == "ok":
                res = GroupResult(g, "skipped", int(m.get("posting_rows", 0)), 0.0)
                results.append(res)
                _lineage_append(
                    out_dir,
                    {"stage": "postings", "group": g, "status": "skipped",
                     "rows": res.rows, "wall_s": 0.0, "fingerprint": fp},
                )
                continue

        postings_g = build_postings_long(
            corpus_g, doc_key, text_col, stem=stem, with_positions=with_positions
        )
        gpath = os.path.join(out_dir, "postings_long", f"group={g}")
        postings_g.write.mode("overwrite").parquet(gpath)
        n_rows = corpus_g.sparkSession.read.parquet(gpath).count()
        wall = time.perf_counter() - t0
        with open(mpath, "w") as f:
            json.dump(
                {"group": g, "status": "ok", "posting_rows": n_rows,
                 "fingerprint": fp, "wall_s": round(wall, 3)},
                f,
            )
        results.append(GroupResult(g, "built", n_rows, wall))
        _lineage_append(
            out_dir,
            {"stage": "postings", "group": g, "status": "built",
             "rows": n_rows, "wall_s": round(wall, 3),
             "rows_per_sec": round(n_rows / wall, 1) if wall else None,
             "docs": fp["rows"],
             "docs_per_sec": round(fp["rows"] / wall, 1) if wall else None,
             "fingerprint": fp},
        )
    return results


def finalize_index(
    spark: SparkSession,
    out_dir: str,
    doc_key: Sequence[str] = DOC_KEY,
    write_stats: bool = True,
) -> InvertedIndex:
    """Merge all checkpointed groups into a queryable InvertedIndex.

    Reads the partitioned long postings back (columnar, partition-pruned)
    and computes doc/corpus statistics once, globally — the analog of the
    reference's one-time MySQL tf/weight/corpus post-pass (report p.3).
    """
    t0 = time.perf_counter()
    # accepts both the batch checkpoint layout (group=N) and the
    # streaming ingest layout (epoch=N) — drop() ignores absent columns
    postings = spark.read.parquet(os.path.join(out_dir, "postings_long")).drop(
        "group", "epoch"
    )
    stats = doc_stats(postings, doc_key).cache()
    totals = stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("doc_len").alias("total_len")
    ).collect()[0]
    n_docs = int(totals["n_docs"] or 0)
    avg_len = float(totals["total_len"] or 0) / n_docs if n_docs else 0.0
    n_postings = postings.count()
    cstats = corpus_stats(postings, n_docs, n_postings).cache()
    if write_stats:
        stats.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_stats"))
        cstats.write.mode("overwrite").parquet(os.path.join(out_dir, "corpus_stats"))
    _lineage_append(
        out_dir,
        {"stage": "finalize", "group": None, "status": "built",
         "rows": n_postings, "n_docs": n_docs,
         "wall_s": round(time.perf_counter() - t0, 3)},
    )
    return InvertedIndex(
        postings=postings,
        doc_stats=stats,
        corpus_stats=cstats,
        doc_key=tuple(doc_key),
        n_docs=n_docs,
        n_postings=n_postings,
        avg_doc_len=avg_len,
    )


def read_lineage(out_dir: str) -> list[dict]:
    path = os.path.join(out_dir, "_lineage.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]

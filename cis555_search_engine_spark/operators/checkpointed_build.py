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

Manifests and lineage go through the Hadoop FileSystem API (`fsio`),
like the block-store manifest: the checkpoint state lives wherever the
data does (HDFS / object storage), not only on the driver's local disk,
and manifest writes are ATOMIC — a crash mid-write can never leave a
torn JSON that breaks the resume scan.
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
    # "/"-joined (not os.path.join) so hdfs://... / s3a://... URIs work
    return f"{out_dir}/_manifests/group_{group:05d}.json"


def _lineage_append(spark: SparkSession, out_dir: str, record: dict) -> None:
    """Append one lineage record via read + atomic rewrite: `file://`
    (ChecksumFileSystem) does not support fs.append(), and the log is
    one small JSON line per group — O(groups²) bytes re-written total,
    trivial against the group builds themselves."""
    from .. import fsio

    record = dict(record, ts=time.time())
    path = f"{out_dir}/_lineage.jsonl"
    prev = fsio.read_text(spark, path) if fsio.exists(spark, path) else ""
    fsio.write_text_atomic(spark, path, prev + json.dumps(record) + "\n")


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
    from .. import fsio

    spark = corpus.sparkSession
    # build-parameter guard: the per-group manifests fingerprint only
    # the INPUT slice, so a resume with different n_groups would leave
    # stale group dirs that finalize_index unions in (silently
    # duplicated postings: a group=16 layout resumed with n_groups=8
    # rebuilds 0-7 over ALL docs and keeps 8-15), and a resume with a
    # different stem/positions setting would SKIP groups whose data was
    # built under the old setting. Record the parameters once; any
    # mismatch on resume fails fast.
    build_params = {
        "n_groups": int(n_groups),
        "doc_key": list(doc_key),
        "text_col": text_col,
        "stem": bool(stem),
        "with_positions": bool(with_positions),
    }
    bmeta_path = f"{out_dir}/_build_params.json"
    if fsio.exists(spark, bmeta_path):
        prev = json.loads(fsio.read_text(spark, bmeta_path))
        if prev != build_params:
            raise ValueError(
                f"checkpointed build dir {out_dir} was created with "
                f"{prev}; resuming with {build_params} would mix layouts "
                f"— reuse the original parameters or delete the directory"
            )
    else:
        fsio.write_text_atomic(spark, bmeta_path, json.dumps(build_params))
    gcol = _group_col(n_groups)
    results: list[GroupResult] = []

    for g in range(n_groups):
        t0 = time.perf_counter()
        mpath = _manifest_path(out_dir, g)
        corpus_g = corpus.filter(gcol == g)
        fp = _fingerprint(corpus_g, doc_key)

        if fsio.exists(spark, mpath):
            try:
                m = json.loads(fsio.read_text(spark, mpath))
            except ValueError:
                m = {}  # torn legacy manifest (pre-atomic-write): rebuild
            if m.get("fingerprint") == fp and m.get("status") == "ok":
                res = GroupResult(g, "skipped", int(m.get("posting_rows", 0)), 0.0)
                results.append(res)
                _lineage_append(
                    spark, out_dir,
                    {"stage": "postings", "group": g, "status": "skipped",
                     "rows": res.rows, "wall_s": 0.0, "fingerprint": fp},
                )
                continue

        postings_g = build_postings_long(
            corpus_g, doc_key, text_col, stem=stem, with_positions=with_positions
        )
        gpath = f"{out_dir}/postings_long/group={g}"
        postings_g.write.mode("overwrite").parquet(gpath)
        n_rows = spark.read.parquet(gpath).count()
        wall = time.perf_counter() - t0
        fsio.write_text_atomic(
            spark, mpath,
            json.dumps(
                {"group": g, "status": "ok", "posting_rows": n_rows,
                 "fingerprint": fp, "wall_s": round(wall, 3)}
            ),
        )
        results.append(GroupResult(g, "built", n_rows, wall))
        _lineage_append(
            spark, out_dir,
            {"stage": "postings", "group": g, "status": "built",
             "rows": n_rows, "wall_s": round(wall, 3),
             "rows_per_sec": round(n_rows / wall, 1) if wall else None,
             "docs": fp["rows"],
             "docs_per_sec": round(fp["rows"] / wall, 1) if wall else None,
             "fingerprint": fp},
        )
    return results


def _postings_coverage(spark: SparkSession, out_dir: str) -> list[str]:
    """Sorted partition-directory names under postings_long (group=N /
    epoch=N), ignoring markers — a cheap listing-level fingerprint of
    what the persisted statistics were computed OVER."""
    from .. import fsio

    return sorted(
        name
        for name in fsio.list_children(spark, f"{out_dir}/postings_long")
        if not name.startswith(("_", "."))
    )


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
    from .. import fsio

    t0 = time.perf_counter()
    # drop the session's cached file listing for this path: Spark's
    # shared FileStatusCache remembers the partition-dir listing from a
    # previous read, so a reopen AFTER new epoch dirs landed would
    # silently scan only the old partitions (stale read, same session)
    spark.catalog.refreshByPath(f"{out_dir}/postings_long")
    # capture the partition listing ONCE, before the postings read: any
    # coverage manifest written below must describe at most what the
    # stats were computed over — an epoch landing mid-finalize then
    # reads as a mismatch next open (recompute, safe), never as
    # fresh-but-stale
    coverage_now = _postings_coverage(spark, out_dir)
    # accepts both the batch checkpoint layout (group=N) and the
    # streaming ingest layout (epoch=N) — drop() ignores absent columns
    postings = spark.read.parquet(f"{out_dir}/postings_long").drop(
        "group", "epoch"
    )
    # Persisted stats are only valid for the postings layout they were
    # computed over: a dir finalized once and then EXTENDED (incremental
    # epochs appended) must not serve the old n_docs/df/avg_doc_len —
    # wrong BM25 idf for every doc and no stats for the appended ones
    # (ADVICE r4, medium). The coverage manifest written next to the
    # stats records the partition-dir listing at stats time; any
    # mismatch (or a legacy dir without the manifest) falls back to
    # recomputation, the pre-persistence behavior.
    stats_fresh = False
    if not write_stats and fsio.exists(spark, f"{out_dir}/_stats_coverage.json"):
        try:
            covered = json.loads(
                fsio.read_text(spark, f"{out_dir}/_stats_coverage.json")
            ).get("partitions")
        except ValueError:
            covered = None
        stats_fresh = covered == coverage_now
    if (
        not write_stats
        and stats_fresh
        and fsio.exists(spark, f"{out_dir}/doc_stats")
        and fsio.exists(spark, f"{out_dir}/corpus_stats")
    ):
        # READ-ONLY reopen (SearchEngine.load): the build already
        # persisted the statistics — re-aggregating them from the full
        # postings scan at every open is exactly the recomputation the
        # persisted stats exist to avoid, and a read-only open must not
        # append to the build's lineage log either.
        stats = spark.read.parquet(f"{out_dir}/doc_stats").cache()
        cstats = spark.read.parquet(f"{out_dir}/corpus_stats").cache()
        totals = stats.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("doc_len").alias("total_len")
        ).collect()[0]
        n_docs = int(totals["n_docs"] or 0)
        avg_len = float(totals["total_len"] or 0) / n_docs if n_docs else 0.0
        n_postings = int(
            cstats.agg(F.sum("df").alias("s")).collect()[0]["s"] or 0
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
    stats = doc_stats(postings, doc_key).cache()
    totals = stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("doc_len").alias("total_len")
    ).collect()[0]
    n_docs = int(totals["n_docs"] or 0)
    avg_len = float(totals["total_len"] or 0) / n_docs if n_docs else 0.0
    n_postings = postings.count()
    cstats = corpus_stats(postings, n_docs, n_postings).cache()
    if write_stats:
        stats.write.mode("overwrite").parquet(f"{out_dir}/doc_stats")
        cstats.write.mode("overwrite").parquet(f"{out_dir}/corpus_stats")
        fsio.write_text_atomic(
            spark, f"{out_dir}/_stats_coverage.json",
            json.dumps({"partitions": coverage_now}),
        )
        _lineage_append(
            spark, out_dir,
            {"stage": "finalize", "group": None, "status": "built",
             "rows": n_postings, "n_docs": n_docs,
             "wall_s": round(time.perf_counter() - t0, 3)},
        )
    else:
        # SELF-HEAL (review r5): a read-only reopen only reaches here
        # when the persisted stats are missing, stale, or predate the
        # coverage manifest (a dir finalized before the manifest
        # existed would otherwise recompute on EVERY open, forever).
        # Persist the freshly computed stats + coverage best-effort so
        # the NEXT open takes the fast path; on read-only storage this
        # degrades silently to the old recompute-per-open behavior.
        # The coverage written is the listing captured BEFORE the
        # postings read, so a concurrently landing epoch can only make
        # the manifest conservative (mismatch -> recompute), never
        # fresh-but-stale. No lineage append: read-only opens must not
        # grow the build log (test_readonly_load_* contract).
        try:
            stats.write.mode("overwrite").parquet(f"{out_dir}/doc_stats")
            cstats.write.mode("overwrite").parquet(f"{out_dir}/corpus_stats")
            fsio.write_text_atomic(
                spark, f"{out_dir}/_stats_coverage.json",
                json.dumps({"partitions": coverage_now}),
            )
        except Exception:  # pragma: no cover - read-only storage
            pass
    return InvertedIndex(
        postings=postings,
        doc_stats=stats,
        corpus_stats=cstats,
        doc_key=tuple(doc_key),
        n_docs=n_docs,
        n_postings=n_postings,
        avg_doc_len=avg_len,
    )


def read_lineage(out_dir: str, spark: SparkSession | None = None) -> list[dict]:
    """Lineage records of a checkpointed build dir. Uses the active
    Spark session's Hadoop FS when available (so hdfs://... lineage is
    readable); falls back to local file IO for sessionless callers."""
    path = f"{out_dir}/_lineage.jsonl"
    spark = spark or SparkSession.getActiveSession()
    if spark is not None:
        from .. import fsio

        if not fsio.exists(spark, path):
            return []
        text = fsio.read_text(spark, path)
    else:
        if not os.path.exists(path):
            return []
        with open(path) as f:
            text = f.read()
    return [json.loads(line) for line in text.splitlines() if line.strip()]

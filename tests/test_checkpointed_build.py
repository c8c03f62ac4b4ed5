"""Checkpoint/resume + lineage tests (SURVEY.md §7 step 6)."""

from __future__ import annotations

import json
import os
import shutil

import pytest


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "index_ckpt")


def _build(corpus_sdf, out_dir, n_groups=4):
    from cis555_search_engine_spark.operators.checkpointed_build import (
        checkpointed_postings_build,
    )

    return checkpointed_postings_build(corpus_sdf, out_dir, n_groups=n_groups)


def test_full_build_then_resume_skips_everything(corpus_sdf, out_dir):
    from cis555_search_engine_spark.operators.checkpointed_build import read_lineage

    r1 = _build(corpus_sdf, out_dir)
    assert [g.status for g in r1] == ["built"] * 4
    r2 = _build(corpus_sdf, out_dir)
    assert [g.status for g in r2] == ["skipped"] * 4
    assert [g.rows for g in r2] == [g.rows for g in r1]
    lineage = read_lineage(out_dir)
    assert len(lineage) == 8
    assert all("wall_s" in rec and "fingerprint" in rec for rec in lineage)


def test_resume_rebuilds_only_missing_group(corpus_sdf, out_dir):
    r1 = _build(corpus_sdf, out_dir)
    # simulate a crash that lost group 2: manifest gone, data partial
    os.remove(os.path.join(out_dir, "_manifests", "group_00002.json"))
    shutil.rmtree(os.path.join(out_dir, "postings_long", "group=2"))
    r2 = _build(corpus_sdf, out_dir)
    statuses = {g.group: g.status for g in r2}
    assert statuses == {0: "skipped", 1: "skipped", 2: "built", 3: "skipped"}
    assert r2[2].rows == r1[2].rows


def test_stale_manifest_fingerprint_triggers_rebuild(corpus_sdf, out_dir):
    _build(corpus_sdf, out_dir)
    mpath = os.path.join(out_dir, "_manifests", "group_00001.json")
    with open(mpath) as f:
        m = json.load(f)
    m["fingerprint"]["rows"] += 1  # pretend the input changed
    with open(mpath, "w") as f:
        json.dump(m, f)
    # manifests are written via the Hadoop FS (ChecksumFileSystem on
    # file://); hand-editing the file behind its back invalidates the
    # .crc sidecar, so drop it (production never hand-edits manifests)
    crc = os.path.join(out_dir, "_manifests", ".group_00001.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    r2 = _build(corpus_sdf, out_dir)
    statuses = {g.group: g.status for g in r2}
    assert statuses[1] == "built"
    assert statuses[0] == statuses[2] == statuses[3] == "skipped"


def test_finalized_index_equals_direct_build(spark, corpus_sdf, spark_index, out_dir):
    from cis555_search_engine_spark.operators.checkpointed_build import finalize_index

    _build(corpus_sdf, out_dir)
    idx = finalize_index(spark, out_dir, write_stats=False)
    assert idx.n_docs == spark_index.n_docs
    assert idx.n_postings == spark_index.n_postings
    assert abs(idx.avg_doc_len - spark_index.avg_doc_len) < 1e-9

    key = lambda r: (r["conv_id"], r["turn_idx"], r["term"])  # noqa: E731
    got = {key(r): (r["tf"], tuple(r["positions"])) for r in idx.postings.collect()}
    want = {key(r): (r["tf"], tuple(r["positions"])) for r in spark_index.postings.collect()}
    assert got == want


def test_finalized_index_answers_queries(spark, corpus_sdf, spark_index, out_dir):
    from cis555_search_engine_spark.operators.checkpointed_build import finalize_index
    from cis555_search_engine_spark.operators.scoring import bm25_topk

    _build(corpus_sdf, out_dir)
    idx = finalize_index(spark, out_dir, write_stats=False)
    got = [(r["conv_id"], r["turn_idx"]) for r in bm25_topk(idx, "rice noodle", k=10).collect()]
    want = [(r["conv_id"], r["turn_idx"]) for r in bm25_topk(spark_index, "rice noodle", k=10).collect()]
    assert got == want


def test_resume_with_different_params_fails_fast(spark, corpus_sdf, tmp_path):
    """Per-group manifests fingerprint the input, not the build params —
    resuming a group=16 layout with n_groups=8 (or a different stem
    setting) would silently mix layouts, so it must refuse instead."""
    import pytest as _pytest

    from cis555_search_engine_spark.operators.checkpointed_build import (
        checkpointed_postings_build,
    )

    out = str(tmp_path / "ckpt")
    checkpointed_postings_build(corpus_sdf, out, n_groups=4)
    with _pytest.raises(ValueError, match="mix layouts"):
        checkpointed_postings_build(corpus_sdf, out, n_groups=2)
    with _pytest.raises(ValueError, match="mix layouts"):
        checkpointed_postings_build(corpus_sdf, out, n_groups=4, stem=False)
    # same params: clean resume (all groups skipped)
    res = checkpointed_postings_build(corpus_sdf, out, n_groups=4)
    assert all(r.status == "skipped" for r in res)


def test_readonly_load_recomputes_when_postings_extended(spark, corpus_sdf, tmp_path):
    """A dir finalized once (stats persisted) and then EXTENDED by
    incremental epochs must not serve the stale persisted statistics on
    a read-only reopen: n_docs/df/avg_doc_len must cover the appended
    postings too (ADVICE r4, medium — stats coverage manifest)."""
    from pyspark.sql import functions as F

    from cis555_search_engine_spark.engine import SearchEngine
    from cis555_search_engine_spark.operators.checkpointed_build import finalize_index
    from cis555_search_engine_spark.operators.index_build import build_postings_long

    out = str(tmp_path / "idx")
    half = corpus_sdf.filter(F.xxhash64("conv_id") % 2 == 0)
    rest = corpus_sdf.join(half.select("conv_id").distinct(), "conv_id", "left_anti")
    # streaming-ingest layout: epoch=N partition dirs
    build_postings_long(half).write.mode("overwrite").parquet(
        f"{out}/postings_long/epoch=0"
    )
    n_half = finalize_index(spark, out, write_stats=True).n_docs  # persists stats
    # an incremental epoch lands AFTER the finalize persisted the stats
    build_postings_long(rest).write.mode("overwrite").parquet(
        f"{out}/postings_long/epoch=1"
    )
    re1 = SearchEngine.load(spark, out)  # write_stats=False reopen
    full = finalize_index(spark, out, write_stats=False)
    assert re1.index.n_docs == full.n_docs > n_half
    assert re1.index.n_postings == full.n_postings
    assert abs(re1.index.avg_doc_len - full.avg_doc_len) < 1e-9


def test_readonly_load_uses_persisted_stats_and_keeps_lineage(spark, corpus_sdf, tmp_path):
    """SearchEngine.load must read the persisted stats (not re-aggregate
    the postings) and must NOT grow the build's lineage log."""
    from cis555_search_engine_spark.engine import SearchEngine
    from cis555_search_engine_spark.operators.checkpointed_build import read_lineage

    out = str(tmp_path / "idx")
    eng = SearchEngine.build_checkpointed(spark, corpus_sdf, out, n_groups=2)
    n_before = len(read_lineage(out, spark))
    re1 = SearchEngine.load(spark, out)
    re2 = SearchEngine.load(spark, out)
    assert len(read_lineage(out, spark)) == n_before  # read-only opens
    assert re1.index.n_docs == eng.index.n_docs
    assert re1.index.n_postings == eng.index.n_postings
    assert abs(re1.index.avg_doc_len - eng.index.avg_doc_len) < 1e-9
    a = {tuple(r) for r in re1.search("rice noodle", k=5).collect()}
    b = {tuple(r) for r in re2.search("rice noodle", k=5).collect()}
    assert a == b


def test_readonly_load_self_heals_legacy_stats_coverage(spark, corpus_sdf, tmp_path):
    """A dir finalized BEFORE the coverage manifest existed (stats
    persisted, no _stats_coverage.json) must not recompute statistics on
    every read-only open forever: the first open recomputes (correct)
    and best-effort persists stats + coverage, so the second open takes
    the fast path. Lineage must not grow on either open (review r5)."""
    import os

    from cis555_search_engine_spark.engine import SearchEngine
    from cis555_search_engine_spark.operators.checkpointed_build import read_lineage

    out = str(tmp_path / "idx")
    eng = SearchEngine.build_checkpointed(spark, corpus_sdf, out, n_groups=2)
    # simulate the legacy layout: stats exist, coverage manifest absent
    os.remove(os.path.join(out, "_stats_coverage.json"))
    n_before = len(read_lineage(out, spark))
    re1 = SearchEngine.load(spark, out)  # recomputes AND heals
    assert os.path.exists(os.path.join(out, "_stats_coverage.json"))
    re2 = SearchEngine.load(spark, out)  # healed: fast path
    assert len(read_lineage(out, spark)) == n_before
    for re_ in (re1, re2):
        assert re_.index.n_docs == eng.index.n_docs
        assert re_.index.n_postings == eng.index.n_postings
        assert abs(re_.index.avg_doc_len - eng.index.avg_doc_len) < 1e-9

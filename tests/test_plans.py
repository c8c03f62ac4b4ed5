"""Physical-plan quality assertions (the plans we'd want at 100 TB).

These lock in the scale-relevant properties of the physical plans:
filters pushed to the parquet scan, column pruning, broadcast joins on
small sides, TakeOrderedAndProject for top-k (never a global sort), and
the shuffle-free guarantee of the doc-local postings build.
"""

from __future__ import annotations

import pytest


def explain_str(df, mode: str = "formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(em)


SF = "/root/testdata/sf0.001"


def test_doclocal_build_has_no_shuffle(spark, corpus_sdf):
    from cis555_search_engine_spark.operators.index_build import build_postings_doclocal

    plan = explain_str(build_postings_doclocal(corpus_sdf, stem=True))
    assert "Exchange" not in plan  # narrow map end-to-end
    # and the groupBy variant DOES shuffle (sanity of the assertion)
    from cis555_search_engine_spark.operators.index_build import build_postings_long

    assert "Exchange" in explain_str(build_postings_long(corpus_sdf, stem=True))


def test_topk_plans_take_ordered_not_global_sort(spark_index):
    from cis555_search_engine_spark.operators.scoring import bm25_topk

    plan = explain_str(bm25_topk(spark_index, "rice noodle", k=80))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # corpus-stats side broadcast


def test_filter_pushdown_and_column_pruning(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    plan = explain_str(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection reaches the scan: only the 3 needed columns are read
    assert "ReadSchema: struct<l_quantity:double,l_returnflag:string,l_shipdate:timestamp" in plan


def test_semi_join_is_broadcast(spark, spark_index):
    from pyspark.sql import functions as F

    terms = spark.createDataFrame([("rice",), ("noodl",)], "term string")
    j = spark_index.postings.join(F.broadcast(terms), "term", "left_semi")
    plan = explain_str(j)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_whole_stage_codegen_covers_native_tokenize(spark, corpus_sdf, tmp_path):
    from cis555_search_engine_spark.operators.index_build import tokenize_turns

    # parquet-backed so the plan is a real scan, not a LocalTableScan
    p = str(tmp_path / "corpus")
    corpus_sdf.write.parquet(p)
    corpus = spark.read.parquet(p)

    plan = explain_str(tokenize_turns(corpus))
    # formatted mode marks codegen'd operators with '* '
    assert "* ColumnarToRow" in plan or "WholeStageCodegen" in plan
    assert "ArrowEvalPython" not in plan  # native path stays JVM-side
    codegen = explain_str(tokenize_turns(corpus), "codegen")
    assert "WholeStageCodegen subtrees" in codegen

    plan_udf = explain_str(tokenize_turns(corpus, use_pandas_udf=True))
    assert "ArrowEvalPython" in plan_udf  # the UDF path is Arrow, not row Python
    assert "BatchEvalPython" not in plan_udf


def test_block_query_broadcasts_survivor_filter(spark_index):
    from cis555_search_engine_spark.operators.postings_codec import build_blocks

    bidx = build_blocks(spark_index, block_span=64)
    from cis555_search_engine_spark.operators.postings_codec import decode_blocks

    plan = explain_str(decode_blocks(bidx.blocks, 64))
    # decode path is mapInPandas over blocks: Arrow, no row-Python
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_block_build_no_forced_vocab_broadcast(spark, corpus_sdf):
    """The block-store BUILD path must not force-broadcast vocab-sized
    frames (corpus_stats idf join, stem dictionary): with auto-broadcast
    disabled, the build plan contains no BroadcastExchange at all — so
    every broadcast that does appear at runtime is AQE's size-based
    choice, never a hint on an unbounded frame (round-4 verdict item 1;
    the serving-path idf broadcasts stay hinted because they are
    filtered to query terms first)."""
    from cis555_search_engine_spark.operators.index_build import build_index
    from cis555_search_engine_spark.operators.postings_codec import build_blocks

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # fresh (uncached) index so the stem-dictionary join is IN the
        # plan lineage, not hidden behind an InMemoryTableScan
        idx = build_index(corpus_sdf, cache=False)
        bidx = build_blocks(idx, block_span=64)
        plan = explain_str(bidx.blocks)
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tpch_q3_builds_broadcast_join(spark):
    import cis555_search_engine_spark.entry_queries as EQ

    plan = explain_str(EQ.q_tpch_q3(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_sample_stratified_is_scan_fused(spark):
    """The stratified sampler must stay a narrow scan-side filter: no
    Exchange, no join, no Python — the property that makes it free at
    100 TB (it rides the scan the downstream consumer already pays for)."""
    from cis555_search_engine_spark.operators.curation import sample_stratified

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = explain_str(sample_stratified(docs, {"en": 0.5, "de": 0.25}))
    for op in ("Exchange", "Join", "ArrowEvalPython", "BatchEvalPython"):
        assert op not in plan, plan


def test_decontaminate_plan_shape(spark):
    """No cartesian/nested-loop anywhere (the join is keyed by shingle
    hash), and no forced broadcast of the big training side; the eval
    side broadcast is opt-in."""
    from pyspark.sql import functions as F

    from cis555_search_engine_spark.operators.decontam import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    plan = explain_str(decontaminate(train, ev, broadcast_eval=True))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the opted-in eval side
    plan_shuffle = explain_str(decontaminate(train, ev, broadcast_eval=False))
    assert "CartesianProduct" not in plan_shuffle


def test_facet_counts_single_agg_after_join(spark_index, corpus_sdf):
    """Facet agg stays one hash aggregate pair (partial+final) over the
    match-set join — no window, no sort, no Python."""
    plan = explain_str(
        __import__(
            "cis555_search_engine_spark.operators.scoring", fromlist=["facet_counts"]
        ).facet_counts(
            spark_index, "rice noodle", corpus_sdf.select("conv_id", "turn_idx", "role"), "role"
        )
    )
    # Arrow stem lineage (ArrowEvalPython) is fine — the invariants are
    # no window/sort machinery, no cartesian, and no row-at-a-time Python
    for op in ("Window", "BatchEvalPython", "CartesianProduct"):
        assert op not in plan, plan
    assert "HashAggregate" in plan


def test_dictionary_prefix_scan_pushdown(spark, spark_index, tmp_path):
    """The persisted term dictionary is range-partitioned + sorted by
    term (postings_codec._write_stats), and a prefix completion over it
    pushes StartsWith to the parquet scan — footer min/max ranges make
    the probe touch only the covering file(s)."""
    from pyspark.sql import functions as F

    from cis555_search_engine_spark.operators.postings_codec import (
        build_blocks,
        load_blocks,
        write_blocks,
    )

    store = str(tmp_path / "store")
    write_blocks(build_blocks(spark_index, block_span=64), store, n_buckets=4)
    bidx = load_blocks(spark, store)
    q = (
        bidx.corpus_stats.filter(F.col("term").startswith("s"))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(5)
    )
    plan = explain_str(q)
    assert "StringStartsWith(term,s)" in plan, plan
    # results equal the in-memory dictionary's completion
    want = (
        spark_index.corpus_stats.filter(F.col("term").startswith("s"))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(5)
        .collect()
    )
    assert [tuple(r) for r in q.collect()] == [tuple(r) for r in want]


def test_hybrid_rrf_legs_cut_before_rank_window(spark):
    """The RRF fuse plan must show each leg's distributed top-N cut
    (TakeOrderedAndProject) feeding the single-partition rank window —
    i.e. the global ordering work happens in the leg, and the window
    sorts only the bounded cut. No cartesian product anywhere."""
    from cis555_search_engine_spark.entry_queries import q_hybrid_rrf

    plan = explain_str(q_hybrid_rrf(spark, SF))
    # two legs (lexical + vector), each a TakeOrderedAndProject
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan
    # the fuse itself is one hash aggregation over the unioned legs
    assert "Union" in plan


def test_mmr_candidate_join_is_bounded_input(spark):
    """mmr_rerank's result is a driver-computed LocalRelation over a
    BOUNDED candidate collect — the plan must be a local scan (no
    re-execution of the retrieval per action), and the unbounded-input
    guard must trip before any unbounded collect."""
    from cis555_search_engine_spark.operators.similarity import mmr_rerank

    emb = spark.range(30).selectExpr(
        "id as vec_id", "array(cast(id as float), 1.0f) as embedding"
    )
    cand = spark.range(30).selectExpr("id as doc_id", "cast(id as double) as rel")
    out = mmr_rerank(cand.limit(10), emb, k=3)
    plan = explain_str(out)
    assert any(s in plan for s in ("LocalTableScan", "LocalRelation", "ExistingRDD"))
    with pytest.raises(ValueError):
        mmr_rerank(cand, emb, k=3, max_candidates=5)

"""SearchEngine facade tests: build/checkpoint/load + all query modes."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def engine(spark, corpus_sdf):
    from cis555_search_engine_spark.engine import SearchEngine

    return SearchEngine.build(spark, corpus_sdf)


def test_all_rankers_answer(engine):
    for ranker in ("bm25", "tfidf", "cosine"):
        rows = engine.search("rice noodle", k=5, ranker=ranker).collect()
        assert 0 < len(rows) <= 5
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_and_mode_subset_of_or(engine):
    or_docs = {(r["conv_id"], r["turn_idx"]) for r in engine.search("rice noodle", k=10**6).collect()}
    and_docs = {(r["conv_id"], r["turn_idx"])
                for r in engine.search("rice noodle", k=10**6, mode="and").collect()}
    assert and_docs <= or_docs


def test_blocks_path_matches_longform(engine):
    a = [(r["conv_id"], r["turn_idx"]) for r in engine.search("coronavirus", k=10).collect()]
    b = [(r["conv_id"], r["turn_idx"]) for r in engine.search_blocks("coronavirus", k=10).collect()]
    assert a == b


def test_unknown_ranker_raises(engine):
    with pytest.raises(ValueError):
        engine.search("x", ranker="pagerank")


def test_checkpoint_build_then_load_roundtrip(spark, corpus_sdf, tmp_path):
    from cis555_search_engine_spark.engine import SearchEngine

    d = str(tmp_path / "idx")
    eng1 = SearchEngine.build_checkpointed(spark, corpus_sdf, d, n_groups=3)
    want = [(r["conv_id"], r["turn_idx"]) for r in eng1.search("zoom", k=5).collect()]
    eng2 = SearchEngine.load(spark, d)
    got = [(r["conv_id"], r["turn_idx"]) for r in eng2.search("zoom", k=5).collect()]
    assert got == want

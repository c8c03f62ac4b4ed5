"""SearchEngine facade — the reference's end-to-end surface in one class.

Reference user story (SURVEY.md §3): crawl -> index into MySQL -> HTTP
frontend answers keyword queries with tf-idf+pagerank top-80. A user of
that system gets the same lifecycle here:

    eng = SearchEngine.build(spark, corpus_df)            # index in memory
    eng = SearchEngine.build_checkpointed(spark, corpus_df, "/idx")  # resumable
    eng = SearchEngine.load(spark, "/idx")                # reopen later
    eng.search("rice noodle")                  # BM25 top-k (primary)
    eng.search("rice noodle", mode="and")      # posting-list intersection
    eng.search("rice noodle", ranker="tfidf")  # reference parity ranker
    eng.search("rice noodle", ranker="cosine") # reference cosine ranker
    eng.search_blocks("rice noodle")           # compressed block-max path
    eng.phrase("rice noodle")                  # positional phrase match

Results are (conv_id, turn_idx, score) DataFrames with the deterministic
(score DESC, conv_id, turn_idx) tie-break throughout.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .operators.checkpointed_build import checkpointed_postings_build, finalize_index
from .operators.index_build import DOC_KEY, InvertedIndex, build_index
from .operators.postings_codec import (
    BlockIndex,
    bm25_topk_blocks,
    build_blocks,
    phrase_match_blocks,
)
from .operators.scoring import bm25_topk, cosine_ref_topk, tfidf_ref_topk


@dataclass
class SearchEngine:
    spark: SparkSession
    index: InvertedIndex
    _blocks: BlockIndex | None = None

    # ---------------------------------------------------------- build

    @classmethod
    def build(cls, spark: SparkSession, corpus: DataFrame, **kw) -> "SearchEngine":
        return cls(spark, build_index(corpus, **kw))

    @classmethod
    def build_checkpointed(
        cls, spark: SparkSession, corpus: DataFrame, out_dir: str, n_groups: int = 16, **kw
    ) -> "SearchEngine":
        """Resumable build: killed mid-way, re-calling with the same args
        skips completed groups (manifests + lineage in out_dir)."""
        checkpointed_postings_build(corpus, out_dir, n_groups=n_groups, **kw)
        return cls(spark, finalize_index(spark, out_dir))

    @classmethod
    def load(cls, spark: SparkSession, out_dir: str) -> "SearchEngine":
        """Reopen a checkpointed index directory."""
        return cls(spark, finalize_index(spark, out_dir, write_stats=False))

    # ---------------------------------------------------------- query

    def search(
        self, query: str, k: int = 80, ranker: str = "bm25", mode: str = "or"
    ) -> DataFrame:
        if ranker == "bm25":
            return bm25_topk(self.index, query, k=k, conjunctive=(mode == "and"))
        if ranker == "tfidf":
            return tfidf_ref_topk(self.index, query, k=k)
        if ranker == "cosine":
            return cosine_ref_topk(self.index, query, k=k)
        raise ValueError(f"unknown ranker {ranker!r} (bm25|tfidf|cosine)")

    def blocks(self, block_span: int | None = None) -> BlockIndex:
        if self._blocks is None:
            kw = {"block_span": block_span} if block_span else {}
            self._blocks = build_blocks(self.index, **kw).cache()
        return self._blocks

    def search_blocks(self, query: str, k: int = 80, mode: str = "or", prune: bool = True) -> DataFrame:
        return bm25_topk_blocks(
            self.blocks(), query, k=k, prune=prune, conjunctive=(mode == "and")
        )

    def phrase(self, phrase: str) -> DataFrame:
        return phrase_match_blocks(self.blocks(), phrase)

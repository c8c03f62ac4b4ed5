"""Inverted-index build: corpus -> postings + doc stats + corpus stats.

Reference pipeline (SURVEY.md §3.2, ``indexer/Indexer.java:295-454``):
one JVM per manual shard, per-doc Java hash-map word counts, batched
row-per-posting INSERTs into MySQL, tf/weight backfilled by SQL post-pass.

Spark-first redesign — one declarative job:

    corpus
      -> tokenize (native regexp codegen, or Arrow pandas UDF)     [P2,P3]
      -> posexplode -> (doc, pos, raw_token)
      -> Porter stem via DISTINCT-vocab pandas UDF + broadcast join [P4,J8]
         (the reference's `stemmer` dictionary trick, stem.java:74-157 —
          stemming cost is O(|vocab|), not O(|tokens|))
      -> groupBy(doc, term):  tf = count, positions = collect_list   [A1]
      -> doc_stats:    groupBy(doc): doc_len, max_tf                 [A2]
      -> corpus_stats: groupBy(term): df (exact), idf columns        [A4,F5]

Scale notes (100 TB / 10^12 turns):
- tokenize+explode is narrow (no shuffle); the only shuffles are the two
  aggregations, both with map-side partial aggregation.
- groupBy(doc, term) is keyed by (doc, term) — never skewed by hot terms
  because the doc key spreads them.
- groupBy(term) for df is a count-aggregate: partial aggregation already
  collapses each map partition to one row per term, so a hot term costs
  #partitions rows in the shuffle, not #postings. An explicitly salted
  two-phase variant is provided (`document_frequency_salted`) as the
  pattern required for non-reducible aggregates, and is what
  `postings_codec.build_blocks` relies on (blocks = doc-range salting).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.porter import porter_stem
from ..functions.tokenizer import tokenize_col, tokenize_udf

DOC_KEY: tuple[str, ...] = ("conv_id", "turn_idx")


@F.pandas_udf(T.StringType())
def porter_stem_udf(terms: pd.Series) -> pd.Series:
    """Vectorized Porter stem; only ever applied to the distinct vocab."""
    return terms.map(lambda t: porter_stem(t) if isinstance(t, str) else t)


@F.pandas_udf(T.ArrayType(T.StringType()))
def stem_tokens_udf(tok_arrays: pd.Series) -> pd.Series:
    """Arrow-vectorized per-array stemming with a per-batch memo dict —
    effective cost is one Porter run per distinct token per batch (the
    `stemmer`-dictionary trick, stem.java:74-157, without the join)."""
    cache: dict[str, str] = {}

    def stem_list(toks):
        if toks is None:
            # null text -> null token array (tokenize_col of NULL); the
            # null must pass through like the stem=False and long-form
            # paths, not crash the batch (a tool-only turn has text=NULL
            # under TRANSCRIPT_SCHEMA)
            return None
        out = []
        for t in toks:
            s = cache.get(t)
            if s is None:
                s = porter_stem(t)
                cache[t] = s
            out.append(s)
        return out

    return tok_arrays.map(stem_list)


def tokenize_turns(
    corpus: DataFrame,
    doc_key: Sequence[str] = DOC_KEY,
    text_col: str = "text",
    use_pandas_udf: bool = False,
) -> DataFrame:
    """corpus -> (doc_key..., pos, raw_term), one row per kept token.

    ``use_pandas_udf=False`` keeps tokenization in whole-stage codegen
    (regexp_extract_all); ``True`` routes through the Arrow pandas UDF.
    Both are property-tested identical.
    """
    tok = tokenize_udf(F.col(text_col)) if use_pandas_udf else tokenize_col(F.col(text_col))
    return (
        corpus.select(*doc_key, F.posexplode(tok).alias("pos", "raw_term"))
    )


def stem_dictionary(tokens: DataFrame, term_col: str = "raw_term") -> DataFrame:
    """(raw, target) for every distinct token — the reference's `stemmer`
    table (2,246,656 rows there; tiny relative to the token stream)."""
    return (
        tokens.select(F.col(term_col).alias("raw"))
        .distinct()
        .withColumn("target", porter_stem_udf(F.col("raw")))
    )


def build_postings_long(
    corpus: DataFrame,
    doc_key: Sequence[str] = DOC_KEY,
    text_col: str = "text",
    stem: bool = True,
    use_pandas_udf: bool = False,
    with_positions: bool = True,
) -> DataFrame:
    """corpus -> long-form postings (doc_key..., term, tf, positions).

    The reference's `invertedIndexStemmed` row-per-(term,doc) shape
    (report p.2) with positions added per the north rule.
    """
    toks = tokenize_turns(corpus, doc_key, text_col, use_pandas_udf)
    if stem:
        dic = stem_dictionary(toks)
        toks = (
            # dictionary is vocab-sized (reference: 2.2M rows; ~10^8 at
            # 100 TB by Heaps' law) — no forced broadcast: AQE broadcasts
            # a small dictionary at test scale and shuffles a huge one
            toks.join(dic, toks.raw_term == dic.raw, "left")
            .select(*doc_key, "pos", F.coalesce("target", "raw_term").alias("term"))
        )
    else:
        toks = toks.withColumnRenamed("raw_term", "term")
    aggs = [F.count(F.lit(1)).cast("int").alias("tf")]
    if with_positions:
        aggs.append(F.array_sort(F.collect_list("pos")).alias("positions"))
    return toks.groupBy(*doc_key, "term").agg(*aggs)


def build_postings_doclocal(
    corpus: DataFrame,
    doc_key: Sequence[str] = DOC_KEY,
    text_col: str = "text",
    stem: bool = True,
    use_pandas_udf: bool = False,
    with_positions: bool = True,
) -> DataFrame:
    """Shuffle-free postings build — the scale path.

    TF and positions are doc-local facts: instead of explode +
    groupBy(doc, term) (which shuffles every token occurrence —
    ~10^13 rows at the 10^12-turn target), compute them per document
    with native higher-order array functions inside ONE narrow map:

        toks      = tokenize (native) [+ stem via Arrow UDF]
        terms     = array_distinct(toks)
        per term  : tf = |filter(toks, = t)|,
                    positions = filter(indexes, toks[i] = t)
        explode the per-doc posting structs -> final long rows

    No shuffle anywhere; the only later shuffles in an index build are
    the (tiny, partially-aggregated) df/corpus-stats rollups. Per-doc
    cost is O(|distinct| * |toks|) — fine for transcript-turn-sized
    docs; for book-length docs prefer `build_postings_long`.

    Property-tested identical to `build_postings_long`
    (tests/test_index_parity.py::test_doclocal_equals_groupby).
    """
    tok = tokenize_udf(F.col(text_col)) if use_pandas_udf else tokenize_col(F.col(text_col))
    if stem:
        tok = stem_tokens_udf(tok)
    doc = corpus.select(*doc_key, tok.alias("toks"))
    idx = F.sequence(F.lit(0), F.size("toks") - 1)
    post_struct = lambda t: F.struct(  # noqa: E731
        t.alias("term"),
        F.size(F.filter("toks", lambda x: x == t)).cast("int").alias("tf"),
        *(
            [
                F.filter(idx, lambda i: F.element_at("toks", i + 1) == t)
                .cast("array<int>")
                .alias("positions")
            ]
            if with_positions
            else []
        ),
    )
    parr = F.transform(F.array_distinct("toks"), post_struct)
    out = doc.select(*doc_key, F.explode(parr).alias("p"))
    cols = [*doc_key, "p.term", "p.tf"] + (["p.positions"] if with_positions else [])
    return out.select(*cols)


def doc_stats(postings: DataFrame, doc_key: Sequence[str] = DOC_KEY) -> DataFrame:
    """(doc_key..., doc_len, max_tf) — id2url.max_count analog
    (Indexer.java:405-410) plus BM25's doc length."""
    return postings.groupBy(*doc_key).agg(
        F.sum("tf").cast("int").alias("doc_len"),
        F.max("tf").cast("int").alias("max_tf"),
    )


def document_frequency(postings: DataFrame) -> DataFrame:
    """(term, df) — exact document frequency (`corpus.numDoc`, report p.3).

    Plain count aggregate: map-side partial agg makes hot terms cost one
    row per input partition in the shuffle.
    """
    return postings.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))


def document_frequency_salted(postings: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Two-phase salted aggregation (term, salt) -> term.

    The explicit hot-key pattern of the north rule (reference analog: the
    FieldBased host-hash router, stormlite/routers/FieldBased.java:57-72).
    For count-like aggs Catalyst's partial aggregation already defuses
    skew; this variant is the template for aggregates with no map-side
    reduction (collect_list-style), and is tested equal to
    :func:`document_frequency`.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in postings.columns if c != "term"]), F.lit(salt_buckets))
    partial = (
        postings.withColumn("salt", salt)
        .groupBy("term", "salt")
        .agg(F.count(F.lit(1)).alias("pdf"))
    )
    return partial.groupBy("term").agg(F.sum("pdf").cast("long").alias("df"))


def stats_from_df(df_frame: DataFrame, n_docs: int, n_postings: int) -> DataFrame:
    """(term, df) -> (term, df, idf_ref, idf_bm25) — THE one place the
    idf formulas live (corpus_stats, merge_indexes, append_blocks, and
    compact_blocks all derive stats through here; the reference's
    idf_ref quirk below must never diverge between them).

    idf_ref  = ln(n_postings / df)   — the reference's quirk: N = total
               posting rows, not doc count (verified SURVEY §1.1 against
               report p.3 example rows).
    idf_bm25 = ln((N - df + .5)/(df + .5) + 1), N = n_docs.
    """
    return df_frame.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.log(F.lit(float(n_postings)) / F.col("df")).alias("idf_ref"),
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf_bm25"),
    )


def corpus_stats(
    postings: DataFrame, n_docs: int, n_postings: int
) -> DataFrame:
    """(term, df, idf_ref, idf_bm25) — see :func:`stats_from_df`."""
    return stats_from_df(document_frequency(postings), n_docs, n_postings)


@dataclass
class InvertedIndex:
    """Materialized index artifacts (all Spark DataFrames) + scalars."""

    postings: DataFrame     # (doc_key..., term, tf, positions)
    doc_stats: DataFrame    # (doc_key..., doc_len, max_tf)
    corpus_stats: DataFrame  # (term, df, idf_ref, idf_bm25)
    doc_key: tuple[str, ...]
    n_docs: int
    n_postings: int
    avg_doc_len: float


def merge_indexes(a: InvertedIndex, b: InvertedIndex) -> InvertedIndex:
    """Merge two indexes over DISJOINT document sets (segment merge —
    the north rule's posting-list merge; reference analog: 17 manually
    sharded indexer JVMs all writing one MySQL table, report p.3).

    Scale-right: postings and doc-stats are unions (no recompute);
    corpus stats merge at the STATS level — df(term) = df_a + df_b via
    one outer join over the (small) vocabularies, never re-aggregating
    the posting rows. IDFs are recomputed from the merged totals.
    """
    if a.doc_key != b.doc_key:
        raise ValueError(f"doc_key mismatch: {a.doc_key} vs {b.doc_key}")
    postings = a.postings.unionByName(b.postings)
    stats = a.doc_stats.unionByName(b.doc_stats)
    n_docs = a.n_docs + b.n_docs
    n_postings = a.n_postings + b.n_postings
    total_len = a.avg_doc_len * a.n_docs + b.avg_doc_len * b.n_docs
    avg_len = total_len / n_docs if n_docs else 0.0
    dfa = a.corpus_stats.select("term", F.col("df").alias("dfa"))
    dfb = b.corpus_stats.select("term", F.col("df").alias("dfb"))
    merged_df = (
        dfa.join(dfb, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("dfa", F.lit(0)) + F.coalesce("dfb", F.lit(0))).alias("df"),
        )
    )
    cstats = stats_from_df(merged_df, n_docs, n_postings)
    return InvertedIndex(
        postings=postings,
        doc_stats=stats,
        corpus_stats=cstats,
        doc_key=a.doc_key,
        n_docs=n_docs,
        n_postings=n_postings,
        avg_doc_len=avg_len,
    )


def build_index(
    corpus: DataFrame,
    doc_key: Sequence[str] = DOC_KEY,
    text_col: str = "text",
    stem: bool = True,
    use_pandas_udf: bool = False,
    cache: bool | str = True,
    doc_local: bool = True,
) -> InvertedIndex:
    """End-to-end batch index build (SURVEY.md §7 step 2/3).

    ``doc_local=True`` (default) uses the shuffle-free postings build;
    both paths are property-tested identical.

    ``cache``: True pins postings/stats with .cache() (session-lived —
    right for a serving index); ``"checkpoint"`` stages them with an
    eager localCheckpoint instead (materialized once, lineage-truncated,
    RELEASED when the frames are GC'd — right for one-shot consumers
    like a streaming-maintenance epoch, where per-epoch .cache() calls
    would accumulate for the stream's lifetime); False leaves the plan
    lazy (every downstream consumer re-tokenizes — the round-3 drain
    paid the tokenize pipeline ~5x per epoch this way)."""
    build = build_postings_doclocal if doc_local else build_postings_long
    postings = build(corpus, doc_key, text_col, stem, use_pandas_udf)
    if cache == "checkpoint":
        # LAZY checkpoint: the totals agg below is the materializing
        # action, so ONE job tokenizes + persists + aggregates — the
        # eager form paid a separate materialization pass first, a pure
        # per-epoch fixed cost on the streaming drain (every epoch runs
        # build_index; round-4 verdict item 7). Spark materializes the
        # WHOLE partition into the block store on first compute, so the
        # staged postings are complete for every later consumer.
        postings = postings.localCheckpoint(eager=False)
    elif cache:
        postings = postings.cache()
    stats = doc_stats(postings, doc_key)
    if cache is True:
        stats = stats.cache()
    elif cache == "checkpoint":
        # lazy-stage the per-doc stats too: an append epoch consumes
        # them from 3 independent phases (docid mint, block encode,
        # collision scan) — unstaged, each re-runs the groupBy shuffle
        stats = stats.localCheckpoint(eager=False)
    # ONE action for all three scalars (n_postings = posting rows;
    # total_len = Σtf overall ≡ Σ doc_len; n_docs = distinct doc keys):
    # the previous two-job split (doc_stats agg + postings.count) was a
    # third of the streaming drain's per-epoch fixed cost — every epoch
    # pays build_index's scalar jobs (round-4 verdict item 7).
    # count_distinct over a STRUCT, not bare columns: bare-column
    # count_distinct drops rows where ANY key component is null, while
    # doc_stats' groupBy keeps null-key groups — a null conv_id doc
    # would shrink n_docs below the doc_stats row count (skewing
    # avg_doc_len/idf) and an all-null-key micro-batch would read as
    # n_docs=0, which the streaming sink treats as an empty epoch. A
    # struct with null fields is itself non-null, so its distinct count
    # matches the groupBy's grouping exactly.
    totals = postings.agg(
        F.count(F.lit(1)).alias("n_postings"),
        F.sum("tf").alias("total_len"),
        F.count_distinct(
            F.struct(*[F.col(c) for c in doc_key])
        ).alias("n_docs"),
    ).collect()[0]
    n_docs = int(totals["n_docs"] or 0)
    avg_len = float(totals["total_len"] or 0) / n_docs if n_docs else 0.0
    n_postings = int(totals["n_postings"] or 0)
    cstats = corpus_stats(postings, n_docs, n_postings)
    if cache is True:
        cstats = cstats.cache()
    elif cache == "checkpoint":
        # same staging argument: block encode and the stats-level merge
        # both read the term stats in the same append epoch
        cstats = cstats.localCheckpoint(eager=False)
    return InvertedIndex(
        postings=postings,
        doc_stats=stats,
        corpus_stats=cstats,
        doc_key=tuple(doc_key),
        n_docs=n_docs,
        n_postings=n_postings,
        avg_doc_len=avg_len,
    )


def static_prune(index: InvertedIndex, keep_per_term: int = 64) -> InvertedIndex:
    """Static index pruning — the top-k variant of Carmel et al.
    (SIGIR'01): keep per term only the ``keep_per_term`` highest-impact
    postings (BM25 partial score under the index's OWN global stats;
    ties → doc-key order), drop the rest from storage. Statistics stay
    the ORIGINAL df/idf/avg_doc_len (the paper's model: prune what is
    stored, not what is believed — scores of surviving postings are
    unchanged, so the pruned index's top-k agrees with the full index
    exactly whenever every true top-k posting survives the cut).

    Why at 100 TB: long-tail query terms keep their full lists (df ≤
    keep) while head terms shed the low-impact bulk — the classic
    latency/size lever for a serving replica that answers top-10
    queries (the archival full index stays the source of truth).

    Scale shape: the impact needs doc_len (one doc-key join) and
    idf_bm25 (a vocab-sized plain equi-join — NO broadcast hint, the
    build-path discipline). The per-term cut is TWO window passes:
    rank within (term, salt) first — 32 salt buckets bound the hot-term
    partition a single (term) window would sort in one task — then rank
    the ≤ 32·keep survivors within (term). Both engines cut on the
    6-dp-ROUNDED impact with the doc-key tie-break, so the survivor SET
    is bit-identical cross-engine. doc_stats/corpus_stats are shared
    frames (unchanged), so no rebuild cost beyond the postings pass.
    """
    from pyspark.sql import Window

    if keep_per_term <= 0:
        raise ValueError(f"keep_per_term must be positive, got {keep_per_term}")
    from .scoring import bm25_score_col

    key = list(index.doc_key)
    n_salt = 32
    imp = F.round(
        bm25_score_col(
            F.col("tf"), F.col("idf_bm25"), F.col("doc_len"), index.avg_doc_len
        ),
        6,
    )
    scored = (
        index.postings
        .join(index.corpus_stats.select("term", "idf_bm25"), "term")
        .join(index.doc_stats.select(*key, "doc_len"), key)
        .withColumn("_imp", imp)
        .withColumn("_salt", F.pmod(F.xxhash64(*key), F.lit(n_salt)))
    )
    order = [F.desc("_imp")] + [F.asc(c) for c in key]
    local = Window.partitionBy("term", "_salt").orderBy(*order)
    glob = Window.partitionBy("term").orderBy(*order)
    pruned = (
        scored.withColumn("_r1", F.row_number().over(local))
        .filter(F.col("_r1") <= keep_per_term)
        .withColumn("_r2", F.row_number().over(glob))
        .filter(F.col("_r2") <= keep_per_term)
        .select(*index.postings.columns)
    )
    return InvertedIndex(
        postings=pruned,
        doc_stats=index.doc_stats,
        corpus_stats=index.corpus_stats,
        doc_key=index.doc_key,
        n_docs=index.n_docs,
        n_postings=index.n_postings,  # stats-model contract: unchanged
        avg_doc_len=index.avg_doc_len,
    )

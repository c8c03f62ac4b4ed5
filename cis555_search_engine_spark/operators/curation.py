"""Corpus curation: the composed training-data filter pipeline.

One declarative pass combining the individual operators —
`text_analysis.quality_score`, `text_analysis.lang_id`,
`dedup.exact_dedup` — into the keep/drop decision a pretraining
pipeline applies before tokenization:

    kept = docs
      WHERE quality.score >= min_score
        AND pred_lang IN langs
        AND doc is its dedup-group representative (min id per
            canonical token-set key)

Everything is native column expressions over ONE corpus scan plus ONE
shuffle (the window-min dedup representative); the quality/lang/key
formulas are imported from the standalone operators so the composition
cannot drift from them. Returns (id, pred_lang, score) for kept docs —
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import canonical_key_col, tokens_col


def sample_filter(
    docs: DataFrame, rate: float = 0.5, seed: int = 20200553, id_col: str | None = None
) -> DataFrame:
    """Random-drop sampling filter (SURVEY §2.2 P6 — the reference
    crawler dropped a random fraction of discovered URLs to bound the
    frontier). Two modes:

    - ``id_col=None``: `df.sample` — Bernoulli per row, seeded; fast,
      but row membership depends on partitioning (Spark's sampler is
      seeded PER PARTITION), so it is only stable for a fixed layout.
    - ``id_col`` given: DETERMINISTIC content-keyed sampling —
      keep iff pmod(xxhash64(id, seed), 10^6) < rate*10^6. Same rows
      regardless of partitioning/cluster size; this is the variant a
      reproducible 100 TB pipeline wants (re-runs and retries keep the
      identical subset).
    """
    if id_col is None:
        return docs.sample(withReplacement=False, fraction=rate, seed=seed)
    denom = 1_000_000
    keep = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(denom)) < int(rate * denom)
    return docs.filter(keep)


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the data-mixing step of a
    pretraining pipeline ("take 50% of en, 25% of de, ..."), as one
    scan-side filter with NO shuffle and NO randomness.

    Key = first 8 hex chars of md5(id-as-string) — uniform in [0, 16^8)
    and identically computable in Spark and ANSI SQL (the same
    SQL-reproducible hash family as `hashed_tfidf_features` /
    `dedup.simhash_base_hash`). A row is kept iff its hex key is
    lexicographically below the stratum's threshold
    ``format(int(rate * 16^8), '08x')`` — fixed-width lowercase hex, so
    string order IS numeric order. Properties a 100 TB pipeline needs:

    - membership depends only on (id, rate): re-runs, retries, and any
      cluster size produce the identical sample (Spark's df.sample is
      seeded per-partition — NOT stable under repartitioning);
    - raising a stratum's rate strictly GROWS its sample (nested
      samples: the 25% set is a subset of the 50% set) — reproducible
      ablations;
    - the whole predicate is a native column expression fused into the
      scan (codegen; no UDF, no join, no shuffle).

    Unknown strata get ``default_rate``. ``rate >= 1`` keeps the whole
    stratum (threshold 'g' sorts above every hex digit).
    """
    key = F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8)
    bound = F.lit(hex_rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        bound = F.when(
            F.col(stratum_col) == stratum, F.lit(hex_rate_threshold(rate))
        ).otherwise(bound)
    return docs.filter(key < bound)


def hex_rate_threshold(rate: float) -> str:
    """The sampling threshold for a keep-rate: fixed-width lowercase hex
    of ``int(rate * 16^8)`` ('g' for rate >= 1 — sorts above every hex
    digit). ONE definition, shared by :func:`sample_stratified` and the
    SQL oracle twin (entry_queries) — the oracle's bit-for-bit agreement
    depends on this exact formula, so it must not be duplicated."""
    return "g" if rate >= 1.0 else format(max(int(rate * 16**8), 0), "08x")


def hex_rate_threshold_col(rate_col):
    """Column form of :func:`hex_rate_threshold` for DATA-DEPENDENT
    rates (the per-stratum rates of :func:`sample_temperature` come out
    of an aggregation, so they cannot be baked as literals). The rate is
    rounded to 6 decimals FIRST, in both this plan and the SQL oracle
    twin: the conversion to the 32-bit threshold integer is then applied
    to the identical double on both engines, so a 1-ulp divergence in an
    upstream ``pow``/sum cannot flip the threshold (and with it a row's
    membership). ``format_string('%08x', ...)`` is fixed-width lowercase
    hex — string order IS numeric order, same contract as the scalar
    form."""
    r = F.round(rate_col, 6)
    # clamp at 0 like the scalar form: %08x on a NEGATIVE bigint prints
    # 16 hex chars, which sorts ABOVE every 8-char md5 key — a negative
    # rate would silently keep 100% instead of 0% (review r5)
    return (
        F.when(r >= 1.0, F.lit("g"))
        .when(r <= 0.0, F.lit("00000000"))
        .otherwise(
            F.format_string("%08x", F.floor(r * F.lit(float(16**8))).cast("bigint"))
        )
    )


def sample_temperature(
    docs: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted mixture sampling — the multilingual
    data-mixing step of a pretraining pipeline (public recipe: XLM-R,
    Conneau et al. 2020 §3.1; mBERT exponentiated smoothing): stratum
    ``g`` holding corpus share ``p_g`` is resampled toward share
    ``q_g ∝ p_g^alpha``, which UPWEIGHTS low-resource strata for
    ``alpha < 1`` instead of letting the head language drown them.

    keep_rate_g = min(1, target_frac · N · q_g / (Z · n_g)),
    Z = Σ_g q_g — the expected kept count is ``target_frac · N`` (less
    any mass lost to the min-clamp on upweighted small strata).

    Scale shape: ONE tiny groupBy-count (the only data-sized shuffle;
    group-cardinality rows), corpus-wide N and Z as whole-frame window
    sums over that tiny frame, and the rate frame joined back to the
    corpus (group-cardinality-sized — AQE broadcasts it). Membership is
    the
    same deterministic md5 hex-key predicate as
    :func:`sample_stratified`: a pure function of (id, rate), so samples
    are nested in ``target_frac``, stable under repartitioning/retries,
    and reproducible at any cluster size. Returns the input columns plus
    ``sample_rate`` (the stratum's applied keep-rate, 6-dp)."""
    from pyspark.sql import Window

    if not target_frac > 0.0:
        raise ValueError(f"target_frac must be > 0, got {target_frac}")
    # a re-sampled frame (pipeline sampled/ output) carries sample_rate
    # from the previous pass — replace it, don't emit a duplicate column
    if "sample_rate" in docs.columns:
        docs = docs.drop("sample_rate")
    g = F.col(stratum_col)
    # corpus-wide reductions as whole-frame window sums over the TINY
    # counts frame (group-cardinality rows): no self-referential joins,
    # one extra exchange of a handful of rows
    whole = Window.partitionBy(F.lit(1))
    # names must differ by more than case: the analyzer is
    # case-insensitive by default, so `_N` would REPLACE `_n`
    w = (
        docs.groupBy(g.alias("_g"))
        .agg(F.count("*").alias("_n"))
        .withColumn("_n_tot", F.sum("_n").over(whole))
        .withColumn("_q", F.pow(F.col("_n") / F.col("_n_tot"), F.lit(float(alpha))))
        .withColumn("_z_tot", F.sum("_q").over(whole))
    )
    # operation ORDER mirrors the SQL twin exactly — ((t·N)·q)/(Z·n) —
    # so both engines round the same double (see hex_rate_threshold_col)
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_frac))
        * F.col("_n_tot")
        * F.col("_q")
        / (F.col("_z_tot") * F.col("_n")),
    )
    rates = w.select(
        "_g",
        hex_rate_threshold_col(rate).alias("_thr"),
        F.round(rate, 6).alias("sample_rate"),
    )
    key = F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8)
    # hinted broadcast is BOUNDED here: one 3-column row per stratum
    # (a mixing column is languages/domains — group-cardinality, never
    # corpus-sized). Without the hint, toy-scale size estimates can pick
    # the CORPUS as the build side, the exact wrong shape at 100 TB.
    return (
        docs.join(F.broadcast(rates), g.eqNullSafe(F.col("_g")))  # null-
        # safe: a null stratum is still a stratum (its docs sample at
        # the null group's own rate, not silently drop on an inner-join
        # null key)
        .filter(key < F.col("_thr"))
        .drop("_g", "_thr")
    )


def curate(
    docs: DataFrame,
    min_score: float = 0.55,
    langs: tuple[str, ...] = ("en", "de"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ONE corpus scan + ONE shuffle: every per-row feature (quality
    parts, per-language stopword hits, the 128-bit canonical dedup key)
    is computed in a chain of narrow projections over staged token
    arrays — the formulas are IMPORTED from the standalone operators
    (text_analysis.quality_*/lang_*, dedup.canonical_key_col), so the
    composed pipeline cannot drift from them. The dedup representative
    is a window min over the key (exact_dedup's shape), and the
    quality/lang predicates filter the same frame — no per-feature
    self-joins (the previous shape scanned the corpus three times and
    joined the features back on id)."""
    from pyspark.sql import Window

    from .text_analysis import (
        LANG_ORDER,
        lang_hit_cols,
        lang_pred_expr,
        quality_part_cols,
        quality_score_expr,
    )

    # p1: stage the two token arrays ONCE as column attributes (lambda
    # bodies are not CSE'd — inline splits would re-tokenize per access)
    from .text_analysis import _toks

    toked = docs.select(
        F.col(id_col).alias("id"),
        _toks(F.col(text_col)).alias("tl"),  # the analysis tokenizer, shared
        canonical_key_col(F.col(text_col)).alias("ckey"),
    )
    # p2: every raw feature computed exactly once
    hits = lang_hit_cols(F.col("tl"))
    parts = quality_part_cols(F.col("tl"))
    feat = toked.select(
        "id",
        *[hits[lang].alias(f"h_{lang}") for lang in LANG_ORDER],
        parts["n_tok"].alias("n_tok"),
        parts["n_stop"].alias("n_stop"),
        parts["n_distinct"].alias("n_distinct"),
        F.xxhash64("ckey").alias("k1"),
        F.xxhash64("ckey", F.lit(1)).alias("k2"),
    )
    # p3: blended score + language argmax from the staged features
    pred, _best = lang_pred_expr()
    scored = feat.select(
        "id",
        "k1",
        "k2",
        F.round(
            quality_score_expr(F.col("n_tok"), F.col("n_stop"), F.col("n_distinct")), 6
        ).alias("score"),
        pred.alias("pred_lang"),
    )
    # p4: dedup representative = window min per canonical key (ONE
    # shuffle), then the keep predicates on the same frame
    w = Window.partitionBy("k1", "k2")
    return (
        scored.withColumn("rep_id", F.min("id").over(w))
        .filter(
            (F.col("id") == F.col("rep_id"))
            & (F.col("score") >= min_score)
            & F.col("pred_lang").isin(list(langs))
        )
        .select("id", "pred_lang", "score")
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> DataFrame:
    """Sequence packing for pretraining: assign documents to fixed
    token-budget training chunks, returning
    (id, n_tokens, start_offset, chunk_id) — doc order is the stable id
    order, offsets are the running token count, and a doc belongs to the
    chunk its first token falls in (boundary-agnostic packing; the
    packer that concatenates-and-splits downstream needs exactly this
    map).

    Scale path (the DEFAULT): the mint_doc_ids algebra
    (postings_codec._range_boundaries) — explicit literal range
    boundaries bucket the ids, a per-bucket window computes the local
    running sum, and the tiny per-bucket token totals are collected and
    broadcast back as cumulative offsets. global_offset(row) =
    bucket_offset(_pid) + local_running_sum — identical algebra to one
    global window, with NO single-partition Exchange anywhere (the
    round-2 scale-killer: Window.orderBy(id) sorts 10^12 rows on one
    partition). ``num_buckets=1`` degenerates to the single global
    window — the exact SQL the oracle replays; the two forms are
    property-tested identical (tests/test_dedup.py).
    """
    from pyspark.sql import Window

    toked = docs.select(
        F.col(id_col).alias("id"),
        # coalesce: a null-text turn (valid under the transcript schema)
        # must pack as zero tokens, not poison the running-sum offsets
        # with a NULL n_tokens
        F.coalesce(
            F.size(F.filter(tokens_col(F.col(text_col)), lambda t: t != "")),
            F.lit(0),
        ).alias("n_tokens"),
    )

    def finalize(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("chunk_id", F.floor(F.col("start_offset") / budget_tokens))
            .select("id", F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("start_offset").cast("long").alias("start_offset"),
                    F.col("chunk_id").cast("long").alias("chunk_id"))
        )

    spark = docs.sparkSession
    n_part = num_buckets or spark.sparkContext.defaultParallelism
    if n_part <= 1:
        w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
        return finalize(
            toked.withColumn(
                "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            )
        )

    from .postings_codec import _range_boundaries

    bounds = _range_boundaries(toked.select("id"), ("id",), n_part)
    pid = F.lit(0)
    for (b,) in bounds:
        pid = pid + F.when(F.col("id") >= F.lit(b), 1).otherwise(0)
    bucketed = toked.withColumn("_pid", pid.cast("int"))
    # stage (id, n_tokens, _pid) ONCE (the mint_doc_ids pattern): the
    # eager totals collect below and every downstream action over the
    # returned plan would otherwise EACH re-tokenize the whole corpus —
    # a double-plus full tokenization pass at the scale this path
    # exists for. The staged frame is 3 narrow columns, distributed.
    bucketed = bucketed.localCheckpoint(eager=True)
    totals = bucketed.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    acc = 0
    offsets = []
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((int(row["_pid"]), acc))
        acc += int(row["t"] or 0)
    if not offsets:
        offsets = [(0, 0)]
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy("id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return finalize(
        bucketed.repartition(max(len(offsets), 1), "_pid")
        .withColumn("_local", local)
        .join(F.broadcast(off_df), "_pid")
        .withColumn("start_offset", F.col("_off") + F.col("_local"))
    )


def _gram_bucket(gram, n_buckets: int):
    """Hashed-feature bucket of a gram string: first 8 hex chars of its
    md5, read as an unsigned 32-bit integer, mod n_buckets. The SAME
    formula the SQL oracle twin replays
    (``('0x' || substr(md5(g),1,8))::UBIGINT % B``) — grams are ASCII
    ([a-z-]+ tokens, space-joined bigrams), so the UTF-8 bytes Spark
    hashes are byte-identical to DuckDB's VARCHAR md5 input."""
    return (
        F.conv(F.substring(F.md5(gram.cast("binary")), 1, 8), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    )


def _doc_gram_buckets(docs: DataFrame, text_col: str, n_buckets: int, id_col=None):
    """(id?, b) — one row per gram occurrence, bucketed. Grams are the
    DSIR feature set: unigrams plus adjacent bigrams ("w1 w2") of the
    index tokenizer's stream, built narrowly from two slices of the
    per-doc token array (no positioned-stream self-join) and exploded
    ONCE from the concatenated array."""
    from ..functions.tokenizer import tokenize_col
    from .text_analysis import _bigrams

    toks = tokenize_col(F.col(text_col))
    big_strs = F.transform(
        _bigrams(toks), lambda p: F.concat_ws(" ", p["w1"], p["w2"])
    )
    # _bigrams slices with length n-1: negative for the 0/1-token docs a
    # transcript corpus always contains — those docs contribute their
    # unigrams only
    grams = F.when(F.size(toks) >= 2, F.concat(toks, big_strs)).otherwise(toks)
    cols = [F.col(id_col).alias("id")] if id_col else []
    return docs.select(*cols, F.explode(grams).alias("_g")).select(
        *(["id"] if id_col else []), _gram_bucket(F.col("_g"), n_buckets).alias("b")
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 4096,
    k_smooth: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_grams, logw) — per-document importance weights for
    Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    NeurIPS): score every raw-corpus document by how much more likely
    its hashed n-gram features are under a TARGET corpus (the
    high-quality / in-domain slice you want more of) than under the raw
    corpus itself,

        logw(doc) = Σ_g lr[bucket(g)],     g over the doc's grams,
        lr[b] = ln p̂_target[b] − ln p̂_raw[b],
        p̂[b] = (count[b] + k) / (N + k·B)           (add-k smoothing)

    with features b = md5-hash buckets of unigrams ∪ adjacent bigrams.
    Selecting the top-weighted docs (``dsir_select``) tilts the kept
    corpus toward the target distribution — the data-selection step a
    pretraining pipeline runs between dedup and tokenization. Docs with
    zero tokens have no feature evidence and are absent (callers
    left-join and impute, same contract as lm_perplexity).

    Scale shape: the raw corpus is scanned twice, both passes map-heavy
    with NO corpus-sized shuffle or materialization anywhere. Pass 1
    (distributions): gram stream → groupBy(bucket) — at most B output
    groups, so map-side partials collapse the stream before a B-row
    shuffle; same for the target slice. Pass 2 (weights): gram stream →
    broadcast-join the B-row log-ratio frame (map-side) → groupBy(id)
    — partials collapse each task's occurrences to its distinct doc
    ids, so the only shuffle ships ~n_docs rows. (The obvious
    alternative — a per-doc (id, bucket, c) count frame shared by both
    passes — compresses almost nothing: grams within a doc are mostly
    distinct buckets, so at a 986k-doc profile that frame held 53M rows
    for a 66M-gram stream and its (id,b) shuffle + eager staging cost
    more than the one extra map-only scan this shape pays instead.)
    The log-ratio frame is at most B rows — B is a USER PARAMETER
    (thousands, not vocab-sized), so its hinted broadcast is bounded by
    construction, unlike a vocab/stats ship; the guard below refuses a
    B large enough to break that reasoning. logw rounds to 6 dp (double
    partial-sum order noise; the ln inputs are identical exact doubles
    on both engines — integer counts plus exact halves); the SQL twin
    sums per-occurrence the same way.
    """
    if not 0 < n_buckets <= 1_000_000:
        # the broadcast-boundedness argument above is the point of the
        # cap: a million 3-column rows is ~24 MB, still a sane ship
        raise ValueError(f"n_buckets must be in (0, 1e6], got {n_buckets}")
    if k_smooth <= 0:
        raise ValueError(f"k_smooth must be > 0, got {k_smooth}")
    from pyspark.sql import Window

    gb = _doc_gram_buckets(raw_docs, text_col, n_buckets, id_col=id_col)
    raw_b = gb.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tgt_b = (
        _doc_gram_buckets(target_docs, text_col, n_buckets)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    kb = float(k_smooth) * float(n_buckets)
    joined = raw_b.join(tgt_b, "b", "full_outer").select(
        "b",
        F.coalesce("cr", F.lit(0)).alias("cr"),
        F.coalesce("ct", F.lit(0)).alias("ct"),
    )
    # corpus-wide token totals as whole-frame window sums over the
    # B-bounded joined frame (sample_temperature pattern): a separate
    # totals agg + crossJoin would re-derive the joined subtree — and
    # with it the TARGET tokenize — a second time
    whole = Window.partitionBy(F.lit(1))
    lr = joined.select(
        "b",
        (
            F.log(
                (F.col("ct") + F.lit(float(k_smooth)))
                / (F.sum("ct").over(whole).cast("double") + F.lit(kb))
            )
            - F.log(
                (F.col("cr") + F.lit(float(k_smooth)))
                / (F.sum("cr").over(whole).cast("double") + F.lit(kb))
            )
        ).alias("lr"),
    )
    return (
        gb.join(F.broadcast(lr), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.round(F.sum("lr"), 6).alias("logw"),
        )
    )


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int = 100,
    n_buckets: int = 4096,
    k_smooth: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The selection cut over :func:`dsir_weights`: the k raw-corpus
    docs most target-like by importance weight, deterministic ties on
    id — orderBy+limit plans as TakeOrderedAndProject (per-partition
    heaps, one k-row merge), never a global sort of the scored corpus.
    For fraction-of-corpus selection at full scale, take the weights
    frame and filter on a quantile threshold instead of ranking —
    a 25%-of-10^12-rows cut is a predicate, not a top-k heap."""
    w = dsir_weights(
        raw_docs, target_docs, n_buckets=n_buckets, k_smooth=k_smooth,
        id_col=id_col, text_col=text_col,
    )
    return w.orderBy(F.desc("logw"), F.asc("id")).limit(int(k))


def chunk_windows(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking with overlap — the context-window splitter
    a RAG / pretraining pipeline runs after curation: each document's
    token stream becomes fixed-size chunks of ``window`` tokens starting
    every ``stride`` tokens (overlap = window - stride), the tail chunk
    truncated so every token is covered exactly once by a chunk start.

    Chunk starts are 0, stride, 2*stride, ... with
    n_chunks = 1 + ceil(max(n - window, 0) / stride) — the last start is
    always < n (requires stride <= window, asserted), so no empty chunks
    and no token is dropped. Zero-token docs (null/empty text — valid
    under the transcript schema) produce NO chunks.

    Returns (id, chunk_id, chunk_start, n_tokens, chunk_text),
    deterministic.

    Scale shape: a single narrow projection — tokenize, a per-row
    sequence of chunk starts, posexplode, slice + array_join. No
    shuffle, no UDF, no window function: the plan is scan → generate →
    project and partitions exactly like the input scan at 10^12 turns.
    (pack_sequences is the complementary packer: it CONCATENATES short
    docs up to a budget; this splits long docs down to one.)
    """
    if stride > window or stride <= 0:
        raise ValueError(f"require 0 < stride <= window, got {stride} > {window}")
    toked = docs.select(
        F.col(id_col).alias("id"),
        F.filter(tokens_col(F.col(text_col)), lambda t: t != "").alias("toks"),
    ).filter(F.size("toks") > 0)
    n = F.size("toks")
    # integer ceil((n - window)/stride) without leaving the long domain:
    # (max(n - window, 0) + stride - 1) div stride — doubles would be
    # exact here anyway (n << 2^53) but div keeps the plan integer-typed
    last_chunk = (F.greatest(n - window, F.lit(0)) + (stride - 1)).cast("long")
    starts = F.transform(
        F.sequence(
            F.lit(0).cast("long"), F.floor(last_chunk / F.lit(stride)).cast("long")
        ),
        lambda i: i * stride,
    )
    return (
        toked.select("id", "toks", F.posexplode(starts).alias("chunk_id", "chunk_start"))
        .select(
            "id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.least(F.lit(window), F.size("toks") - F.col("chunk_start"))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_start") + 1, window), " "
            ).alias("chunk_text"),
        )
    )


def shard_assign(
    docs: DataFrame,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the final stage
    of a training-data pipeline: interleave the corpus in a seeded
    pseudo-random order and deal it round-robin into ``n_shards`` output
    shards, so every shard is a uniform sample of the whole corpus and
    shard k's file is written in a reproducible order (epoch reshuffles
    = new seed; re-runs and retries produce byte-identical shards).

    h(id) = the SQL-reproducible 60-bit md5-prefix of ``id || ':' ||
    seed`` (the engine's shared hash convention); global position = rank
    in (h, id) order via the mint_doc_ids algebra — explicit literal
    range boundaries + per-bucket windows + broadcast offsets, NO
    single-partition global window (the round-2 scale-killer: one task
    sorting 10^12 rows); shard = pos % n_shards, pos_in_shard = pos //
    n_shards. Writing then partitions by ``shard`` and sorts within
    partitions by ``pos_in_shard``.

    Returns (id, hkey, pos, shard, pos_in_shard), deterministic under
    any input partitioning.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from .postings_codec import mint_doc_ids

    hashed = docs.select(
        F.col(id_col).alias("id"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"), F.lit(f":{int(seed)}")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hkey"),
    )
    minted = mint_doc_ids(hashed, doc_key=("id",), order_cols=("hkey",))
    return (
        minted.join(hashed, "id")
        .select(
            "id",
            "hkey",
            F.col("docid").alias("pos"),
            (F.col("docid") % n_shards).cast("long").alias("shard"),
            F.floor(F.col("docid") / n_shards).cast("long").alias("pos_in_shard"),
        )
    )

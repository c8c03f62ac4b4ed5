"""Deduplication operators for large-scale training-data pipelines.

Four families, all over a `documents(doc_id, text, ...)` table:

- **exact**: duplicate-content grouping by a canonical content key
  (reference analog: the crawler's seen-URL set / `dropDuplicates`,
  SURVEY.md §2.7; `crawler/URLFilter.java:99-103`).
- **n-gram Jaccard**: exact shingle-set Jaccard over pairs that share at
  least one shingle — no cartesian product: explode shingles, self-join
  on the shingle, count shared per pair. At 100 TB the shingle join is
  the classic "inverted-index join": each shingle's posting list is
  bounded by hot-shingle capping (`max_shingle_df`).
- **MinHash + LSH**: per-shingle base hash = NATIVE xxhash64; the k-fold
  affine family + per-doc min is one Arrow-vectorized numpy pass; banded
  into b bands of r rows; candidate pairs = bucket collisions; survivors
  verified with exact Jaccard. Hash-independent OUTPUT (verified pairs
  ≥ threshold), so the result is comparable against an exact SQL oracle;
  band parameters are chosen so recall at the threshold is 1.0
  (1-(1-s^r)^b ≈ 1 for s≥0.8 with r=2, b=16).
- **SimHash**: 60-bit sign-sum fingerprint of token frequencies on an
  SQL-reproducible base hash (md5 hex prefix -> 60-bit int, computable
  identically in DuckDB), all native bit arithmetic; near-dup candidates
  = equal compound key over 3 of 6 10-bit chunks (Hamming ≤ 3 guarantee
  via pigeonhole; 30-bit keys keep buckets ~n/2^30 at 10^9 docs),
  verified by Hamming distance. Fully oracle-checkable.

Scale notes: every pair-generating join is keyed (shingle / band bucket /
chunk) — never a cross join. Hot keys are capped or salted. Outputs are
deterministic: pairs always (i < j), ordered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------------ util

def tokens_col(text=None):
    """Whitespace tokens (training-data convention: text is already clean;
    the search tokenizer in functions/tokenizer.py is for the index path)."""
    return F.split(F.col("text") if text is None else text, r"\s+")


def shingles_from_tokens(toks, n: int = 3):
    """Distinct word n-gram shingles from a MATERIALIZED token-array
    column (native, no UDF).

    ``toks`` must be a bound column attribute, not an inline
    ``split(...)`` expression: Catalyst does not common-subexpression-
    eliminate inside lambda bodies, so an inline split would be
    re-evaluated for every element access (~180 full-text splits per
    doc — a hidden 10x cost found profiling round 2). Use
    :func:`with_shingles` to stage the projection.

    Docs with fewer than ``n`` tokens yield an EMPTY array: without the
    guard, ``sequence(0, size-n)`` counts DOWN when size<n (Spark picks
    step -1), producing an ANSI element index error. The DuckDB twin's
    ``range(1, len-1)`` is empty for the same docs, so the guard is also
    what keeps oracle parity on short documents.
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def with_shingles(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "sh_arr",
) -> DataFrame:
    """(id, <out_col> array<string>): two-stage projection — tokenize
    ONCE into a column attribute, then shingle from it (see
    shingles_from_tokens for why the staging matters)."""
    toks = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("toks")
    )
    return toks.select("id", shingles_from_tokens(F.col("toks"), n).alias(out_col))


def shingles_col(text=None, n: int = 3):
    """One-expression variant of shingles_from_tokens over raw text —
    correct but re-evaluates the tokenizer per element (see above);
    kept for tests/small inputs. Hot paths use :func:`with_shingles`."""
    toks = tokens_col(F.col("text") if text is None else text)
    return shingles_from_tokens(toks, n)


def with_shingle_hashes(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "shh",
) -> DataFrame:
    """(id, <out_col> array<long>): DISTINCT shingle HASHES per doc,
    never materializing shingle strings.

    Three staged projections (each alias a bound attribute — see
    shingles_from_tokens on why): tokens -> per-token xxhash64 (each
    token hashed ONCE) -> shingle hash = xxhash64 over the n-token hash
    window (slice) -> array_distinct over longs. Identical set semantics
    to string shingles up to 64-bit hash collisions (~|shingles|²/2^65 —
    negligible, disclosed); the win is no string allocation, long-only
    distinct/shuffle, and cheap long-array intersections downstream.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("toks")
    )
    th = toks.select("id", F.transform("toks", lambda t: F.xxhash64(t)).alias("th"))
    idx = F.sequence(F.lit(0), F.size("th") - n)
    sh = F.transform(idx, lambda i: F.xxhash64(F.slice("th", i + 1, n)))
    arr = F.when(F.size("th") >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<long>")
    )
    return th.select("id", arr.alias(out_col))


# ------------------------------------------------------------------ exact

def canonical_key_col(text):
    """The bag-of-words canonical content key (sorted distinct token
    set, space-joined) — ONE definition shared by `exact_dedup` and
    `curation.curate` (which keys its keep/drop dedup on the identical
    canonicalization; a silent divergence between the two would make the
    composed pipeline's dedup disagree with the standalone operator)."""
    return F.array_join(F.array_sort(F.array_distinct(tokens_col(text))), " ")


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    canonical: bool = True,
) -> DataFrame:
    """Group docs by content key; return (rep_id, dup_id) for every
    non-representative duplicate. Representative = min id per group
    (deterministic).

    **Key semantics — read before trusting the word "exact"**:
    ``canonical=True`` (default, and what the driver oracle + `curate`
    key on) canonicalizes to the SORTED DISTINCT TOKEN SET — docs that
    differ only in word order or token multiplicity ("the cat sat on
    the cat" vs "on sat the cat") land in ONE group and the
    non-representative is reported as a duplicate. That is bag-of-words
    dedup (the near-dup-tolerant convention); when byte-level identity
    is required — dropping a reordering IS data loss for
    order-sensitive corpora — pass ``canonical=False`` to key on the
    verbatim text.

    The hash-groupBy exact-dedup: one shuffle on the content key. The
    shuffle key is NOT the key string (arbitrarily wide at scale)
    but two independent 64-bit hashes of it (xxhash64 with two salts =
    128 bits total). The probability of two distinct key forms
    colliding on both hashes is ~n²/2^129 — cryptographically negligible
    (n = 10^12 docs -> ~1e-15); the double hash IS the in-group
    verification, computed map-side so only 16 bytes/row shuffle.
    """
    from pyspark.sql import Window

    key = canonical_key_col(F.col(text_col)) if canonical else F.col(text_col)
    keyed = docs.select(
        F.col(id_col).alias("id"),
        F.xxhash64(key).alias("k1"),
        F.xxhash64(key, F.lit(1)).alias("k2"),
    )
    # representative = min(id) over the group WINDOW — never an array:
    # collect_list would make a pathological duplicate repeated 1e9
    # times one multi-GB row (round-2 scale hazard); the window keeps
    # every group streamed within its shuffle partition. Singleton
    # groups fall out of the id != rep_id filter (their only id IS the
    # min), so no group-size count is needed.
    w = Window.partitionBy("k1", "k2")
    return (
        keyed.withColumn("rep_id", F.min("id").over(w))
        .filter(F.col("id") != F.col("rep_id"))
        .select("rep_id", F.col("id").alias("dup_id"))
    )


# ------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """(i, j, jac) for all pairs with shingle-Jaccard >= threshold, i < j.

    Exact — pairs with jac > 0 must share a shingle, so the shingle-keyed
    self-join enumerates every qualifying pair. Three scale guards:

    - **Hot-shingle cap (ON by default)**: ``max_shingle_df`` removes
      shingles appearing in more than that many docs BEFORE pair
      generation — one hot boilerplate shingle shared by d docs would
      contribute O(d²) candidate rows. The heavy-hitter set is by
      definition tiny (≤ n_shingle_occurrences / cap), so it is collected
      and subtracted from each doc's shingle ARRAY natively
      (array_except) — per-doc shingle-set sizes are therefore the
      post-cap sizes and the reported Jaccard is exact over the KEPT
      shingle sets. Dropped shingles are logged (no silent caps).
    - **Length filter**: jac(A,B) <= min/max of the set sizes, so the
      join prunes pairs whose sizes are outside ratio ``threshold``
      before the pair aggregation.
    - **Hashed join key**: the self-join + shuffle run on
      ``xxhash64(shingle)`` (8 bytes) rather than the shingle string
      (collision odds ~n_shingles²/2^65 — negligible, disclosed).

    Sizes ride along with the exploded rows (computed natively from the
    capped array — no extra join), so the pair aggregation groups by
    (i, j, na, nb) and the Jaccard needs no size backfill joins.
    """
    # stage ONCE: the hot-shingle probe job, the post-cap array rewrite,
    # and both sides of the pair self-join all read this frame — without
    # staging, the tokenize->hash->shingle subplan re-evaluates up to
    # three times (the same discipline minhash/simhash/cosine_lsh
    # already apply; localCheckpoint = eager, lineage-truncating, freed
    # on GC)
    arr = with_shingle_hashes(docs, n, id_col, text_col).localCheckpoint(eager=True)
    if max_shingle_df is not None:
        exploded = arr.select(F.explode_outer("shh").alias("h")).filter(
            F.col("h").isNotNull()
        )
        hot_df = (
            exploded.groupBy("h")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("h")
        )
        # heavy hitters are usually FEW (bounded by occurrences/cap), so
        # collect them as literals for a driver-free array_except — but
        # never materialize an unbounded set on the driver: past the
        # limit, fall back to a distributed broadcast anti-join on the
        # exploded rows (sizes then recomputed post-cap, still exact
        # over kept sets)
        hot_rows = hot_df.limit(10_001).collect()
        hot = sorted(int(r["h"]) for r in hot_rows)
        if hot:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: dropping %s hot shingles with df > %d "
                "(coverage cap; pairs sharing ONLY these are not reported)",
                len(hot) if len(hot) <= 10_000 else "10k+", max_shingle_df,
            )
        if 0 < len(hot) <= 10_000:
            arr = arr.withColumn("shh", F.array_except("shh", F.lit(hot)))
        elif len(hot) > 10_000:
            # rebuild per-doc arrays from the anti-joined kept rows
            # (one extra shuffle — the unbounded-hot-set worst case only)
            kept_ids = (
                arr.select("id", F.explode_outer("shh").alias("h"))
                .filter(F.col("h").isNotNull())
                .join(hot_df, "h", "left_anti")
                .groupBy("id")
                .agg(F.collect_list("h").alias("shh"))
            )
            arr = kept_ids
    # explode_outer + null filter, NOT explode: explode makes the optimizer
    # infer a size()>0 predicate and push it BELOW the staged projections,
    # re-inlining the whole shingle expression (with its per-element
    # tokenizer re-evaluation) into a per-row Filter — a silent ~3x cost
    # found with .explain (PLANS.md)
    sized = (
        arr.select("id", F.size("shh").alias("nsh"), F.explode_outer("shh").alias("h"))
        .filter(F.col("h").isNotNull())
    )
    a = sized.alias("a")
    b = sized.alias("b")
    thr = float(threshold)
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.nsh") >= thr * F.col("a.nsh"))
            & (F.col("a.nsh") >= thr * F.col("b.nsh")),
        )
        .groupBy(
            F.col("a.id").alias("i"),
            F.col("b.id").alias("j"),
            F.col("a.nsh").alias("na"),
            F.col("b.nsh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared
        .withColumn("jac", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jac") >= threshold)
        .select("i", "j", F.round("jac", 6).alias("jac"))
    )


# --------------------------------------------------------- MinHash + LSH

def minhash_affine_min_udf(num_hashes: int = 32):
    """Factory: Arrow-vectorized affine-family min, array<long> base
    hashes -> array<long> of k min-hashes.

    The base hash per shingle is NATIVE ``xxhash64`` (JVM-side, codegen);
    this UDF only applies the k-fold affine family
    ``h_i(x) = a_i*x + b_i (mod 2^64)`` and takes per-row minima in one
    numpy broadcast (uint64 wrap-around is the mod). No Python string
    hashing anywhere — the round-1 per-shingle blake2b loop was the
    signature bottleneck.

    (A fully-native attempt — k × array_min(transform(..., xxhash64)) —
    was catastrophically slow: Catalyst inlines the whole 32-hash
    signature expression into each of the 16 band columns, giving a plan
    too large to print and quadratic re-evaluation. And ANSI mode forbids
    native wrapping multiply. The affine fold is the textbook Arrow-UDF
    case.)
    """
    rng = np.random.default_rng(20200553)  # fixed seed: deterministic family
    A = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    B = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(hash_arrays: pd.Series) -> pd.Series:
        def one(hs) -> list[int] | None:
            if hs is None or len(hs) == 0:
                return None
            x = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            mins = (A[:, None] * x[None, :] + B[:, None]).min(axis=1)
            return mins.astype(np.int64).tolist()

        return hash_arrays.map(one)

    return _sig


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig array<long>) minhash signatures.

    Pipeline: per-doc shingle HASHES (with_shingle_hashes — all native,
    NO shuffle, no strings) -> one Arrow UDF pass for the affine-family
    min. Docs with no shingles (< n tokens) produce NO row — previously
    they all shared a constant sentinel signature and collided pairwise
    in every LSH band (O(m²) candidates among short docs); dropping them
    is semantically right too: an empty shingle set has no well-defined
    Jaccard.
    """
    sh = with_shingle_hashes(docs, n, id_col, text_col).filter(F.size("shh") > 0)
    return sh.select("id", minhash_affine_min_udf(num_hashes)(F.col("shh")).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Output = (i, j, jac) with TRUE shingle-Jaccard >= threshold among LSH
    candidates, i < j — hash-independent, so SQL-oracle-comparable. With
    r = num_hashes/bands = 2 and bands = 16, recall at s >= 0.8 is
    1-(1-s²)^16 > 0.9996; the exact verification step removes all false
    positives. The banded bucket join touches candidate pairs only —
    never all pairs — which is what makes this the 100 TB path while
    `ngram_jaccard_pairs` is the exact small-scale baseline.
    """
    if bands <= 0 or num_hashes % bands != 0:
        # r = num_hashes // bands with r == 0 would make every band hash
        # a constant (xxhash64 over zero signature elements): all docs
        # collide in every bucket = bands x O(n^2) candidate joins, the
        # exact quadratic blow-up this operator exists to avoid; a
        # non-dividing count silently ignores the tail hashes and
        # weakens the documented recall math — both are caller errors.
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}) with "
            f"rows-per-band >= 1"
        )
    r = num_hashes // bands
    # stage the (id, shingle-hash array) frame ONCE: it feeds the
    # signature UDF AND both sides of the exact-Jaccard verification —
    # un-staged, the tokenize→hash→shingle subplan is evaluated three
    # more times, and the copy feeding ArrowEvalPython runs interpreted
    # (outside whole-stage codegen), which alone cost ~4s at sf0.1.
    # localCheckpoint (mint_doc_ids pattern): eager, lineage-truncating,
    # released on GC — ~8·avg_doc_len bytes/doc of executor-local spill.
    sh_staged = with_shingle_hashes(docs, n, id_col, text_col).filter(
        F.size("shh") > 0
    ).localCheckpoint(eager=True)
    sig = sh_staged.select(
        "id", minhash_affine_min_udf(num_hashes)(F.col("shh")).alias("sig")
    )
    band_cols = [
        F.xxhash64(*[F.element_at("sig", b * r + k + 1) for k in range(r)], F.lit(b)).alias("bh")
        for b in range(bands)
    ]
    buckets = sig.select(
        "id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), band_cols[b]) for b in range(bands)])
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    # stage the tiny (id, band, bh) frame so the self-join below reads
    # it instead of running the signature UDF once per side (same fix
    # as cosine_lsh_pairs / simhash_pairs; ~24 bytes × bands per doc)
    buckets = buckets.localCheckpoint(eager=True)
    x = buckets.alias("x")
    y = buckets.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("i"), F.col("y.id").alias("j"))
        .distinct()
    )
    # exact verification on the candidate set only, over shingle-HASH
    # sets (long arrays — set semantics identical to string shingles up
    # to 64-bit collisions), read from the staged frame (no recompute)
    sh = sh_staged.select("id", F.array_sort("shh").alias("sh"))
    verified = (
        cands.join(sh.withColumnRenamed("id", "i").withColumnRenamed("sh", "sha"), "i")
        .join(sh.withColumnRenamed("id", "j").withColumnRenamed("sh", "shb"), "j")
        .withColumn("shared", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jac",
            F.col("shared") / (F.size("sha") + F.size("shb") - F.col("shared")),
        )
        .filter(F.col("jac") >= threshold)
        .select("i", "j", F.round("jac", 6).alias("jac"))
    )
    return verified


# -------------------------------------------------------------- SimHash

SIMHASH_BITS = 60          # 15 hex chars of md5 — fits a positive BIGINT
SIMHASH_CHUNKS = 6         # 10-bit chunks
SIMHASH_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS
SIMHASH_COMBO_SIZE = 3     # join on every 3-chunk combination (C(6,3)=20)


def simhash_base_hash(tok):
    """SQL-reproducible 60-bit token hash: first 15 hex chars of md5.

    Spark: conv(substring(md5(tok),1,15),16,10)::long.
    DuckDB twin: ('0x' || substr(md5(tok),1,15))::BIGINT.
    Both are < 2^60, so no sign/overflow divergence — this is what makes
    the simhash output hash-IDENTICAL across engines and therefore
    oracle-checkable (round 1 used Spark-private xxhash64 and shipped
    without an oracle).
    """
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")


def simhash60(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash long) — 60-bit sign-sum over token frequencies.

    All native: explode tokens -> per-token md5-based 60-bit hash -> for
    each bit, sum(tf * (+1/-1)) -> sign -> assemble bits with
    shiftleft/bitwise-or. The per-bit sums are one hash-agg keyed by doc
    (60 agg columns), with map-side partial aggregation — no UDF, no
    skew (key = doc).
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # stage the md5-derived hash as a bound column: all 60 per-bit agg
    # expressions reference the attribute, not 60 copies of the md5 expr
    tf = tf.select("id", "tf", simhash_base_hash(F.col("tok")).alias("h"))
    h = F.col("h")
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = tf.groupBy("id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("id", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(i, j, hamming) pairs with Hamming(simhash) <= max_hamming.

    Candidate generation: split the 60-bit hash into 6 10-bit chunks and
    equi-join on COMPOUND keys — every C(6,3)=20 combination of 3
    chunks, packed into one long. Pigeonhole: Hamming <= 3 flips bits in
    at most 3 chunks, so at least 3 of the 6 chunks agree exactly, and
    that agreeing 3-subset is one of the enumerated combinations — the
    join finds ALL qualifying pairs, no cross join, no recall loss.

    Why compound keys (round-3 verdict item 4): the old 4x15-bit scheme
    had only 2^15 distinct join values per chunk, so expected bucket
    size grew LINEARLY with corpus size (~30k docs/bucket at 10^9 docs
    -> ~4x10^8 candidate pairs per bucket). Compound 3-chunk keys carry
    30 simhash bits (2^30 values x 20 combos ~ 2^34 join keys): for
    quasi-uniform fingerprints the expected bucket stays ~n/2^30 — ~1
    at 10^9 docs. Residual hot buckets are EXACT-duplicate classes
    (identical text -> identical fingerprint), whose quadratic pair
    mass is inherent to the emit-all-pairs output, not to this scheme.

    Verification = popcount of xor. Output is oracle-checkable because
    the base hash is SQL-reproducible (simhash_base_hash).
    """
    from itertools import combinations

    if max_hamming > SIMHASH_CHUNKS - SIMHASH_COMBO_SIZE:
        # pigeonhole only guarantees an agreeing 3-chunk subset for
        # Hamming <= CHUNKS - COMBO_SIZE; a larger radius could flip
        # bits in 4+ chunks and the qualifying pair would silently never
        # share a join key (recall loss with no error)
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the candidate scheme's "
            f"exact radius {SIMHASH_CHUNKS - SIMHASH_COMBO_SIZE} "
            f"(={SIMHASH_CHUNKS} chunks, {SIMHASH_COMBO_SIZE}-chunk keys); "
            f"lower SIMHASH_COMBO_SIZE or the radius"
        )
    sims = simhash60(docs, id_col, text_col)
    # stage the (id, simhash) frame ONCE: the chunk self-join below
    # would otherwise evaluate the whole simhash subplan — tokenize +
    # md5 + 60 per-bit aggs — once PER JOIN SIDE (the same
    # double-evaluation that made cosine_lsh_pairs round-2's slowest
    # query). localCheckpoint (mint_doc_ids pattern): eager, lineage-
    # truncating, released on GC — never a session-pinned cache.
    sims = sims.localCheckpoint(eager=True)
    mask = (1 << SIMHASH_CHUNK_BITS) - 1

    def chunk_val(c: int):
        return F.shiftright("simhash", c * SIMHASH_CHUNK_BITS).bitwiseAND(F.lit(mask))

    combo_keys = []
    for idx, combo in enumerate(combinations(range(SIMHASH_CHUNKS), SIMHASH_COMBO_SIZE)):
        key = F.lit(idx).cast("long")
        for c in combo:
            key = F.shiftleft(key, SIMHASH_CHUNK_BITS) + chunk_val(c)
        combo_keys.append(key)
    keys = sims.select(
        "id", "simhash", F.explode(F.array(*combo_keys)).alias("k")
    )
    x = keys.alias("x")
    y = keys.alias("y")
    return (
        x.join(
            y,
            (F.col("x.k") == F.col("y.k")) & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("i"),
            F.col("y.id").alias("j"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("hamming"),
        )
        # filter BEFORE the distinct: a pair can agree on several combos
        # (up to 20 duplicate candidate rows), but only qualifying pairs
        # need the dedup shuffle — hamming > max_hamming rows would pay
        # the exchange only to be dropped after it
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ----------------------------------------------------- repeated passages


def repeated_passages(
    docs: DataFrame,
    w: int = 8,
    min_occurrences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 100_000,
) -> DataFrame:
    """(id, span_start, span_end, span_tokens): maximal token spans
    covered by width-``w`` shingles that occur at least
    ``min_occurrences`` times ACROSS THE CORPUS — passage-level (not
    whole-document) duplication, the substring-dedup signal of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", public) re-expressed relationally: their suffix-array "all
    repeated substrings >= 50 tokens" becomes "all maximal unions of
    repeated w-token windows" — the same spans at matching thresholds,
    with no suffix array to build or hold.

    Span semantics: a shingle starting at ``pos`` covers tokens
    ``[pos, pos+w)``; overlapping/adjacent duplicated windows merge, so
    a verbatim k-token boilerplate block shared by two docs reports as
    ONE span of k tokens in each (span_end exclusive). Intra-doc repeats
    count toward ``min_occurrences`` (a doc that repeats its own
    boilerplate is flagged too).

    Scale shape, stage by stage:
    - positions projection: narrow map (per-token xxhash64 once, then
      w-window hashes — the with_shingle_hashes staging discipline, kept
      NON-distinct and position-tagged);
    - repeated-shingle set: one hash agg keyed by the 8-byte shingle
      hash (map-side partial counts), then a semi-join back — the
      inverted-index join again, never a cross join;
    - ``max_shingle_df`` drops degenerate ultra-hot shingles (an empty
      or whitespace artifact shared by 10^8 docs) from span evidence —
      LOGGED when it fires (the ngram_jaccard_pairs no-silent-caps
      pattern: one bounded probe job, a WARNING with the count); the cap
      bounds the semi-join's build side, and a TRUE boilerplate shingle
      under the cap is untouched;
    - span merge: one window per doc ordered by position — partitioned
      by doc id, so state is bounded by doc length and there is no
      global sort anywhere.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("toks")
    )
    th = toks.select("id", F.transform("toks", lambda t: F.xxhash64(t)).alias("th"))
    idx = F.sequence(F.lit(0), F.size("th") - w)
    sh = F.transform(idx, lambda i: F.xxhash64(F.slice("th", i + 1, w)))
    pos_sh = (
        th.select("id", F.when(F.size("th") >= w, sh).alias("sh"))
        .select("id", F.posexplode("sh").alias("pos", "h"))
    )
    # stage ONCE: pos_sh feeds the occurrence agg, the cap-probe job,
    # and the probe side of the hits semi-join — un-staged, the per-doc
    # window hashing (the expensive map stage) runs ~3x per call
    pos_sh = pos_sh.localCheckpoint(eager=True)
    counts = pos_sh.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    dup = counts.filter(F.col("occ") >= min_occurrences)
    if max_shingle_df is not None:
        n_hot = len(
            dup.filter(F.col("occ") > max_shingle_df).select("h").limit(10_001).collect()
        )
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "repeated_passages: dropping %s shingles with occurrences > %d "
                "from span evidence (coverage cap; spans witnessed ONLY by "
                "these are not reported)",
                n_hot if n_hot <= 10_000 else "10k+", max_shingle_df,
            )
        dup = dup.filter(F.col("occ") <= max_shingle_df)
    hits = pos_sh.join(dup.select("h"), "h", "left_semi")

    from pyspark.sql import Window

    by_doc = Window.partitionBy("id").orderBy("pos")
    brk = F.when(
        F.col("pos") > F.lag("pos").over(by_doc) + w, F.lit(1)
    ).otherwise(F.lit(0))
    spans = (
        hits.withColumn("brk", brk)
        .withColumn("span", F.sum("brk").over(by_doc))
        .groupBy("id", "span")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + w).cast("long").alias("span_end"),
        )
    )
    return spans.select(
        "id",
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
    )


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut the duplicated token spans reported by :func:`repeated_passages`
    out of the text — the REMOVAL step of Lee et al. 2022 substring dedup
    (public; their ExactSubstr deletes every copy of a duplicated
    substring, and so does this). Returns
    ``(id, n_tokens, n_removed, text)``: original token count, tokens
    cut, and the text rebuilt from the surviving tokens (single-space
    joined — the whitespace-token convention used across the dedup tier).

    Span semantics match the producer exactly: a span covers token
    positions ``[span_start, span_end)`` under the same whitespace
    tokenization; spans from repeated_passages are per-doc disjoint
    (merged maximal), but overlapping spans from other producers are
    handled too (the cut is membership in ANY span).

    Scale shape: spans collapse to one array per doc (hash agg keyed by
    doc id — bounded by doc length, no skew: the doc id is in the key),
    then ONE left equi-join onto the corpus (duplicate-evidence frames
    are small next to the corpus; AQE broadcasts when they are), and the
    cut itself is a native filter-by-position over the token array — no
    UDF, no explode of the corpus text, no second shuffle. Docs with no
    spans pass through verbatim with n_removed = 0. Reference analog:
    none (pipeline tier; the reference never rewrites its corpus).
    """
    sp = spans.groupBy(F.col("id")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    base = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    joined = base.join(sp, "id", "left")
    cut = F.filter(
        "_toks",
        lambda t, i: ~F.exists(
            "_spans",
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(cut)
    return joined.select(
        "id",
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias(text_col),
    )


def cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Canonical-document selection: given near-dup edges, keep ONE
    representative per duplicate cluster — the highest-``score_col`` doc
    (ties: min id) — the policy step a curation pipeline runs after the
    pair-finding family (public recipe: near-dedup keeping the
    best-quality member, e.g. Lee et al. 2022 §3 "we keep one document
    from each cluster").

    ``pairs`` is any (i, j) edge frame, so every detector in this module
    feeds it (exact keys, n-gram Jaccard, MinHash-LSH, SimHash,
    embedding LSH); ``scores`` is (id, ``score_col``) — e.g.
    ``text_analysis.quality_score``. Docs in no pair are singleton
    clusters and representative of themselves.

    Docs MISSING from ``scores`` (or with a null score) still count as
    cluster members and can still represent a cluster whose every member
    is unscored — they lose to any scored member (missing score =
    lowest), so a partial scores frame never silently drops a doc or a
    whole cluster from the keep-set.

    Scale shape: component labeling is the alternating-star fixpoint
    (operators/components.py); the argmax is TWO hash aggregations —
    per-cluster max score, then min id among the max-score members —
    both with map-side partial agg and the cluster id in the key, so
    the heavy reduction of a giant cluster (the all-identical worst
    case) happens map-side. The residual join of the cluster-cardinality
    agg frame back onto the members is AQE-broadcast when small; at the
    extreme (too many clusters to broadcast AND one giant cluster) AQE's
    skew-join splitting keeps the hot comp partition parallel.
    Returns (comp, rep_id, rep_score, cluster_size); rep_score is null
    when the representative is unscored.
    """
    from .components import connected_components

    comp = connected_components(pairs)
    lab = (
        docs.select(F.col(id_col).alias("id"))
        .join(comp.withColumnRenamed("node", "id"), "id", "left")
        .withColumn("comp", F.coalesce("comp", F.col("id")))
    )
    neg_inf = F.lit(float("-inf"))
    sc = lab.join(scores.select("id", score_col), "id", "left").withColumn(
        "_s", F.coalesce(F.col(score_col).cast("double"), neg_inf)
    )
    agg = sc.groupBy("comp").agg(
        F.max("_s").alias("_best"),
        F.count("*").alias("cluster_size"),
    )
    return (
        sc.join(agg, "comp")
        .filter(F.col("_s") == F.col("_best"))
        .groupBy("comp", "_best", "cluster_size")
        .agg(F.min("id").alias("rep_id"))
        .select(
            "comp",
            "rep_id",
            F.when(F.col("_best") == neg_inf, F.lit(None).cast("double"))
            .otherwise(F.col("_best"))
            .alias("rep_score"),
            "cluster_size",
        )
    )


# ---------------------------------------------------------- winnowing


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS local fingerprinting algorithm): hash every
    k-token gram, then from every window of ``w`` consecutive gram
    hashes select the minimum (ties → leftmost), and de-duplicate the
    selected (hash, pos) pairs per document.

    Guarantees (the paper's): any shared substring of at least
    k + w - 1 tokens is detected by at least one shared fingerprint,
    and density is ~2/(w+1) of the grams — the position-aware,
    subset-free alternative to full shingle sets (ngram_jaccard keeps
    ALL grams; minhash keeps a fixed-size sketch but loses positions).

    Cross-engine determinism: the gram hash is the 60-bit md5-prefix
    convention shared with simhash (`simhash_base_hash`), and the
    window-min compares a FIXED-WIDTH string key (15 hex chars ||
    '-' || zero-padded position) so "min hash, tie → leftmost" is one
    lexicographic min on both engines — no struct-ordering semantics
    to align.

    Scale shape: pure narrow column program — tokenize, gram-hash keys
    via two staged projections (bound attributes: Catalyst does not CSE
    inside lambda bodies), per-row window mins over array slices,
    array_distinct, one explode. No shuffle, no UDF, no window
    function; partitions like the input scan at 10^12 turns. Docs with
    fewer than k tokens yield no fingerprints; fewer than k+w-1 tokens
    yield the single global-min fingerprint (truncated last window —
    the paper's boundary case).

    Returns (id, ghash, pos) — fingerprint hash and the 0-based token
    position of its gram, unordered.
    """
    toked = docs.select(
        F.col(id_col).alias("id"),
        F.filter(tokens_col(F.col(text_col)), lambda t: t != "").alias("toks"),
    ).filter(F.size("toks") >= k)
    grams = toked.select(
        "id",
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (k - 1)),
            lambda i: F.array_join(F.slice(F.col("toks"), i, k), " "),
        ).alias("grams"),
    )
    skeys = grams.select(
        "id",
        F.transform(
            F.col("grams"),
            lambda g, i: F.concat(
                F.substring(F.md5(g.cast("binary")), 1, 15),
                F.lit("-"),
                F.lpad(i.cast("string"), 8, "0"),
            ),
        ).alias("skeys"),
    )
    sel = skeys.select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size("skeys") - w, F.lit(0))),
                    lambda j: F.array_min(F.slice(F.col("skeys"), j + 1, w)),
                )
            )
        ).alias("skey"),
    )
    return sel.select(
        "id",
        F.conv(F.substring("skey", 1, 15), 16, 10).cast("long").alias("ghash"),
        F.substring("skey", 17, 8).cast("long").alias("pos"),
    )


def winnow_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hash_df: int | None = 1000,
) -> DataFrame:
    """(i, j, jac) near-dup pairs by Jaccard over WINNOWED fingerprint
    sets, i < j — the MOSS similarity measure: ~2/(w+1) the rows of the
    full-shingle ngram_jaccard join with the same shared-substring
    detection floor (any common run of ≥ k+w-1 tokens shares a
    fingerprint, so true near-dups cannot be missed — only the Jaccard
    DENOMINATOR is sampled).

    Same scale guards as ngram_jaccard_pairs: a hot-hash cap
    (fingerprints in more than ``max_hash_df`` docs are dropped from
    both sets before pair generation — O(d²) guard; logged, sizes are
    post-cap so the reported Jaccard is exact over kept sets) and a
    size-ratio prune on the join (jac ≤ min/max of the set sizes).
    The join key is the 60-bit gram hash itself — already 8 bytes.
    """
    fps = (
        winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
        .select("id", "ghash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    if max_hash_df is not None:
        hot_df = (
            fps.groupBy("ghash")
            .agg(F.count(F.lit(1)).alias("hdf"))
            .filter(F.col("hdf") > max_hash_df)
            .select("ghash")
        )
        n_hot = hot_df.limit(1).count()
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "winnow_pairs: dropping fingerprints shared by > %d docs "
                "(hot-hash cap; Jaccard is exact over the KEPT sets)",
                max_hash_df,
            )
            fps = fps.join(hot_df, "ghash", "left_anti").localCheckpoint(eager=True)
    sizes = fps.groupBy("id").agg(F.count(F.lit(1)).alias("nf"))
    sized = fps.join(sizes, "id")
    a = sized.select(
        F.col("id").alias("i"), F.col("ghash"), F.col("nf").alias("na")
    )
    b = sized.select(
        F.col("id").alias("j"), F.col("ghash"), F.col("nf").alias("nb")
    )
    thr = float(threshold)
    pairs = (
        a.join(b, "ghash")
        .filter(F.col("i") < F.col("j"))
        .filter(
            F.least(F.col("na"), F.col("nb"))
            >= thr * F.greatest(F.col("na"), F.col("nb"))
        )
        .groupBy("i", "j", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .withColumn(
            "jac",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jac") >= thr)
    )
    return pairs.select("i", "j", "jac")

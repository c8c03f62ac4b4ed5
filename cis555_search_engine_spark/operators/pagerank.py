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

    def finish(result: DataFrame) -> DataFrame:
        # restore the full node set: nodes that never received an
        # in-link are absent from the loop's partial rank frames and
        # hold rank = BASE by definition
        full = nodes.join(result, "id", "left").select(
            "id", F.coalesce(F.col("rank"), F.lit(BASE)).alias("rank")
        )
        out = full.localCheckpoint(eager=True)
        # release the final loop frame too — whether it was checkpointed,
        # cached by a convergence check (the early-convergence leak: a
        # cache-only check iteration could exit the loop), or plain
        # (harmless no-op). `out` is materialized, so nothing re-reads it.
        _release(result)
        for df in pinned:
            if df is not out and df is not result:
                _release(df)
        nodes.unpersist()
        ed.unpersist()
        return out

    for i in range(n_iter):
        # After iteration 1 the rank frame holds only nodes WITH
        # in-links (the agg's key set); every other node's rank is
        # exactly BASE forever, so instead of re-joining `nodes` every
        # iteration (one extra join+exchange per iteration — a third of
        # the loop's stages) the missing ranks are coalesced to BASE at
        # the two read points: the contribution join here and the final
        # projection in `finish`. Algebraically identical output.
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src", "left")
            .select(
                F.col("dst").alias("id"),
                (F.coalesce(F.col("rank"), F.lit(BASE)) / F.col("deg")).alias("c"),
            )
        )
        new_ranks = contribs.groupBy("id").agg(
            (BASE + DAMPING * F.sum("c")).alias("rank")
        )
        is_ckpt = (i + 1) % checkpoint_every == 0 or (i + 1) == n_iter
        check_now = bool(check_every) and (i + 1) % check_every == 0
        if is_ckpt:
            # eager checkpoint materializes THROUGH the pinned parents,
            # so they can be released right after the convergence check
            new_ranks = new_ranks.localCheckpoint(eager=True)
        elif check_now:
            # consumed twice (convergence count + the next iteration):
            # cache. Otherwise a rank frame is consumed exactly ONCE —
            # by the next iteration — and persisting it buys nothing
            # while costing a per-iteration materialization barrier
            # (round-3 bench: caching every iteration doubled the
            # 10-iteration wall time); lineage stays bounded by
            # checkpoint_every either way.
            new_ranks = new_ranks.cache()
        converged = False
        if check_now:
            # left join from the (superset or equal) old frame; a node
            # missing from new_ranks has no in-links and sits at BASE
            moved = (
                ranks.withColumnRenamed("rank", "r0")
                .join(new_ranks, "id", "left")
                .filter(
                    F.abs(F.coalesce(F.col("rank"), F.lit(BASE)) - F.col("r0")) > eps
                )
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
        if is_ckpt or check_now:
            pinned.append(new_ranks)
        ranks = new_ranks
        if converged:
            break
    return finish(ranks)


def hits(
    edges: DataFrame,
    n_iter: int = 10,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Kleinberg's HITS (hubs & authorities, JACM 1999) — the classic
    link-analysis sibling of the reference's PageRank
    (`pagerank/SparkAppMain.java:59-115`), DataFrame-native.

    Per iteration: hub(u) = Σ_{u→v} auth(v), then auth(v) = Σ_{u→v}
    hub(u), each L1-normalized. Returns (id, hub, auth) over the full
    node set (dangling/unreferenced nodes hold 0.0 on the missing side).

    Scale notes — why normalization is FUSED to the lineage cuts:
    dividing by the global sum needs the frame twice (values + its own
    sum), which doubles the plan subtree; done every iteration that
    doubling compounds exponentially. Scaling commutes through the
    linear updates (hub_t ∝ A·auth_{t-1}, auth_t ∝ Aᵀ·hub_t), so the
    normalized fixpoint direction is identical whether we normalize
    every step or only at the ``checkpoint_every`` boundaries where an
    eager localCheckpoint materializes the frame anyway (same hygiene
    as :func:`pagerank`). Between cuts values grow by at most
    λ_max(AᵀA)^Δ — far inside double range for any real Δ ≤ 20.
    Each iteration is two `edges ⋈ scores` + hash aggs, whole-stage
    codegen'd, AQE handling skew; the edge table is cached once.
    """
    if n_iter < 1:
        # the returned scores are documented L1-normalized; zero
        # iterations would return the raw init instead
        raise ValueError("hits() needs n_iter >= 1")
    e = clean_edges(edges).cache()
    nodes = (
        e.select("src").union(e.select(F.col("dst").alias("src"))).distinct()
        .select(F.col("src").alias("id"))
        .cache()
    )
    auth = nodes.select("id", F.lit(1.0).alias("auth"))
    pinned: list[DataFrame] = []

    def _l1(df: DataFrame, col: str) -> DataFrame:
        # in-plan scalar: the 1-row total broadcast-joined back — no
        # driver collect, no per-iteration action
        tot = df.agg(F.sum(col).alias("_t"))
        return df.crossJoin(F.broadcast(tot)).select(
            "id", (F.col(col) / F.col("_t")).alias(col)
        )

    for i in range(n_iter):
        # inner joins drop zero contributions exactly (a node absent
        # from the score frame scores 0 and adds nothing to the sum)
        hub = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .withColumnRenamed("src", "id")
        )
        auth = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .withColumnRenamed("dst", "id")
        )
        if (i + 1) % checkpoint_every == 0 or (i + 1) == n_iter:
            hub = _l1(hub, "hub").localCheckpoint(eager=True)
            auth = _l1(auth, "auth").localCheckpoint(eager=True)
            for df in pinned:
                _release(df)
            pinned = [hub, auth]
    out = (
        nodes.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
        )
        .localCheckpoint(eager=True)
    )
    for df in pinned:
        _release(df)
    nodes.unpersist()
    e.unpersist()
    return out


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 10,
    damping: float = DAMPING,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Personalized PageRank (topic-sensitive PageRank, Haveliwala
    WWW'02): the restart mass (1-d) is concentrated UNIFORMLY on a seed
    set instead of spread over all nodes — rank(i) = base(i) +
    d·Σ_{j→i} rank(j)/deg(j), base(i) = (1-d)·N/|S| for i ∈ S else 0
    (the same unnormalized convention as :func:`pagerank`, whose base
    is the constant (1-d); total mass matches at |S| = N). The result
    ranks nodes by graph proximity to the seeds — "related
    conversations" when seeds are a query's match set, the reference's
    pagerank prior made query-dependent.

    Scale shape mirrors :func:`pagerank`: out-degrees pre-joined once,
    ONE join + one hash agg per iteration, missing ranks coalesced to
    base at the read points (no per-iteration node-set re-join), eager
    localCheckpoint lineage cuts every ``checkpoint_every`` iterations
    with superseded frames released. ``seeds`` is one (id) frame —
    typically tiny; joined, never collected. Fixed ``n_iter`` →
    deterministic (the oracle-parity mode).

    Returns (id, rank) for ALL nodes (non-seed nodes unreachable from
    the seeds hold rank 0).
    """
    e = clean_edges(edges)
    nodes = (
        e.select("src").union(e.select(F.col("dst").alias("src"))).distinct()
        .select(F.col("src").alias("id"))
        .cache()
    )
    n = nodes.count()
    seed_ids = seeds.select(F.col(seeds.columns[0]).alias("id")).distinct()
    seed_ids = seed_ids.join(nodes, "id", "left_semi").cache()
    n_seeds = seed_ids.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed is a graph node")
    base_val = (1.0 - damping) * n / n_seeds
    base = nodes.join(
        seed_ids.withColumn("_b", F.lit(base_val)), "id", "left"
    ).select("id", F.coalesce("_b", F.lit(0.0)).alias("base")).cache()

    degrees = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(degrees, "src").select("src", "dst", "deg").cache()
    ranks = base.select("id", F.col("base").alias("rank"))

    pinned: list[DataFrame] = []
    for i in range(n_iter):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src", "left")
            .select(
                F.col("dst").alias("id"),
                (F.coalesce(F.col("rank"), F.lit(0.0)) / F.col("deg")).alias("c"),
            )
        )
        summed = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        new_ranks = (
            base.join(summed, "id", "left")
            .select(
                "id",
                (F.col("base") + damping * F.coalesce("s", F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or (i + 1) == n_iter:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            for df in pinned:
                _release(df)
            pinned = [new_ranks]
        ranks = new_ranks
    out = ranks
    for df in pinned:
        if df is not out:
            _release(df)
    nodes.unpersist()
    seed_ids.unpersist()
    base.unpersist()
    ed.unpersist()
    return out

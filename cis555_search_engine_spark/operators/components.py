"""Connected components over near-duplicate pair graphs.

The dedup operators (operators/dedup.py) emit PAIRS — (i, j) with
Jaccard/Hamming/exact evidence. A training-data pipeline needs CLUSTERS:
"keep one document per connected component of the near-dup graph". Pair
→ cluster is a connected-components computation, and at 10¹²-doc scale
the graph does not fit anywhere, so the classic label-propagation-until-
diameter loop (O(diameter) rounds) is the wrong algorithm.

This module implements the alternating large-star / small-star algorithm
(Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
Components in MapReduce and Beyond", SoCC'14; public literature, no code
consulted): each round is two vocabulary-partitioned shuffles, and the
edge set converges to per-component stars rooted at the component minimum
in O(log²) rounds (O(log) in practice), independent of component
diameter. Both star operations are pure DataFrame programs — a window
min per neighborhood, no collect, no UDF:

  large-star(u): connect every neighbor v > u to m(u) = min(Γ(u) ∪ {u})
  small-star(u): connect every neighbor v ≤ u, and u itself, to m(u)

Fixpoint detection compares a commutative checksum of the canonical edge
set between rounds (one count + sum-of-hashes aggregate — no driver-side
edge materialization, ~16 bytes collected per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pagerank import _release as _free  # shared RDD-block release


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge list: (a < b), distinct, self-loops
    dropped. Input columns must be (a, b)."""
    return (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One star operation over canonical edges, returned canonical.

    Neighborhoods are expressed as the symmetric (u, v) view; m(u) is a
    window min over the u-partition — each neighborhood is streamed
    inside its shuffle partition, so a 10⁹-member neighborhood (every
    doc near-dup of one template) never materializes as a single row.
    """
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    w = Window.partitionBy("a")
    with_min = sym.withColumn("m", F.least(F.min("b").over(w), F.col("a")))
    if large:
        emitted = with_min.filter(F.col("b") > F.col("a")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
    else:
        low = with_min.filter(F.col("b") <= F.col("a")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        self_edge = with_min.select(F.col("a"), F.col("m").alias("b")).distinct()
        emitted = low.union(self_edge)
    return _canon(emitted)


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # the hash sum rides a decimal(38,0): a long SUM of xxhash64 values
    # overflows under ANSI mode (and silently wraps without it)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "i",
    b_col: str = "j",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; comp = the
    minimum node id reachable from it (deterministic representative —
    the same min-id convention exact_dedup uses per group).

    Each round localCheckpoints the new edge set (eager) so lineage
    stays flat across iterations and the superseded round's blocks are
    freed — the pagerank-loop hygiene applied from the start.
    """
    edges = _canon(
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    prev_sum = _checksum(edges)
    for _ in range(max_rounds):
        stepped = _star(_star(edges, large=True), large=False)
        new_edges = stepped.localCheckpoint(eager=True)
        new_sum = _checksum(new_edges)
        _free(edges)
        edges = new_edges
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    # at fixpoint every edge is (child > root, root); components are the
    # roots' stars plus singleton-free roots themselves
    child = edges.select(F.col("b").alias("node"), F.col("a").alias("comp"))
    roots = nodes.join(
        edges.select(F.col("b").alias("node")), "node", "left_anti"
    ).select("node", F.col("node").alias("comp"))
    # materialize BEFORE freeing the inputs it reads (a lazy return
    # would fault on the released checkpoint blocks); the result is one
    # small row per near-dup node
    out = child.union(roots).localCheckpoint(eager=True)
    _free(nodes)
    _free(edges)
    return out

"""Connected components (operators/components.py) vs a union-find oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cis555_search_engine_spark.operators.components import (
    _canon,
    _star,
    connected_components,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "i: long, j: long")
    if not edges:
        df = df.filter(F.lit(False))
    got = connected_components(df).collect()
    return {r["node"]: r["comp"] for r in got}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 20), (2, 60, 80), (3, 100, 50)])
def test_random_graphs_match_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _uf_components(edges)


def test_long_chain_converges_fast(spark):
    """A path graph is the diameter worst case: label propagation needs
    O(n) rounds; large/small-star must finish in O(log n)."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    import cis555_search_engine_spark.operators.components as C

    calls = []
    orig = C._star

    def counting(e, large):
        calls.append(large)
        return orig(e, large)

    C._star = counting
    try:
        got = _run(spark, edges)
    finally:
        C._star = orig
    assert got == {i: 0 for i in range(n)}
    rounds = len(calls) // 2
    assert rounds <= 10, f"path-64 took {rounds} rounds (expected O(log n))"


def test_empty_and_single_edge(spark):
    assert _run(spark, []) == {}
    assert _run(spark, [(5, 3)]) == {3: 3, 5: 3}


def test_duplicate_and_reversed_pairs(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (9, 8)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


def test_star_ops_preserve_connectivity(spark):
    """One large-star + small-star round must keep the same component
    structure (the paper's correctness invariant)."""
    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    df = _canon(spark.createDataFrame(edges, "a: long, b: long"))
    stepped = _star(_star(df, large=True), large=False)
    before = _uf_components(edges)
    after = _uf_components([(r["a"], r["b"]) for r in stepped.collect()])
    # same partition of the touched nodes (roots may differ mid-run)
    groups_before = {}
    for n, c in before.items():
        groups_before.setdefault(c, set()).add(n)
    groups_after = {}
    for n, c in after.items():
        groups_after.setdefault(c, set()).add(n)
    assert sorted(map(sorted, groups_before.values())) == sorted(
        map(sorted, groups_after.values())
    )


def test_no_rdd_block_leak(spark):
    """The iteration must not pin superseded checkpoint blocks (the
    pagerank round-2 leak, avoided here from the start). Measured as a
    DELTA over pre-existing persisted RDDs: the session is shared across
    test files, and earlier files legitimately hold caches (load/index
    caches) that are not this operator's to release."""
    sc = spark.sparkContext
    pre = {int(i.id()) for i in sc._jsc.sc().getRDDStorageInfo()}
    edges = [(i, i + 1) for i in range(50)]
    df = spark.createDataFrame(edges, "i: long, j: long")
    out = connected_components(df)
    out.count()
    live = {int(i.id()) for i in sc._jsc.sc().getRDDStorageInfo()}
    new = live - pre
    # only the returned (small) result may still hold new blocks
    assert len(new) <= 2, f"{len(new)} persisted RDDs leaked by CC run"
    out.unpersist()

"""Catalog abstraction, export, pagination, pagerank-convergence tests."""

from __future__ import annotations

import glob

import pytest


def test_catalog_parquet_roundtrip(spark, tmp_path):
    from cis555_search_engine_spark.catalog import Catalog

    cat = Catalog(spark, root=str(tmp_path / "warehouse"))
    assert not cat.is_iceberg()
    df = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], "id long, v string, part string")
    cat.write(df, "t1", partition_by=["part"], target_file_rows=1)
    got = sorted((r["id"], r["v"], r["part"]) for r in cat.read("t1").collect())
    assert got == [(1, "a", "x"), (2, "b", "y")]


def test_catalog_overwrite_partitions_is_idempotent_per_partition(spark, tmp_path):
    from cis555_search_engine_spark.catalog import Catalog

    cat = Catalog(spark, root=str(tmp_path / "warehouse"))
    df1 = spark.createDataFrame([(1, "x"), (2, "y")], "id long, part string")
    cat.write(df1, "t2", partition_by=["part"])
    # rewrite ONLY partition x with new content; y must survive
    df2 = spark.createDataFrame([(10, "x")], "id long, part string")
    cat.overwrite_partitions(df2, "t2", ["part"])
    got = sorted((r["id"], r["part"]) for r in cat.read("t2").collect())
    assert got == [(2, "y"), (10, "x")]


def test_catalog_iceberg_identifier():
    from cis555_search_engine_spark.catalog import Catalog

    cat = Catalog(None, catalog="prod", database="search")
    assert cat.is_iceberg()
    assert cat._ident("postings") == "prod.search.postings"


def test_export_csv_chunks(spark, tmp_path):
    from cis555_search_engine_spark.operators.export import export_csv

    df = spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(1)
    out = str(tmp_path / "csv")
    export_csv(df, out, max_rows_per_file=30)
    files = glob.glob(f"{out}/*.csv")
    assert len(files) >= 4  # 100 rows / 30-per-file cap
    rows = spark.read.option("header", "true").csv(out).count()
    assert rows == 100


def test_paginate_matches_reference_slicing(spark):
    from cis555_search_engine_spark.operators.export import paginate, paginate_df

    rows = list(range(35))
    assert paginate(rows, 1, 10) == list(range(10))
    assert paginate(rows, 4, 10) == list(range(30, 35))
    assert paginate(rows, 5, 10) == []

    df = spark.range(35).withColumnRenamed("id", "k")
    page3 = [r["k"] for r in paginate_df(df, ["k"], 3, 10).collect()]
    assert page3 == list(range(20, 30))


def test_pagerank_converges_early_with_share_guard(spark):
    """A10: the reference's Δ>eps share loop guard
    (SparkAppMain.java:88-105) stops iteration once <0.5% of nodes move."""
    from cis555_search_engine_spark.operators.pagerank import pagerank

    # a small strongly-settling graph: star into node 0
    edges = spark.createDataFrame([(i, 0) for i in range(1, 20)], "src long, dst long")
    full = {r["id"]: r["rank"] for r in pagerank(edges, n_iter=50, check_every=None).collect()}
    early = {r["id"]: r["rank"] for r in
             pagerank(edges, n_iter=50, eps=0.01, share_threshold=0.005, check_every=2).collect()}
    assert set(full) == set(early)
    for k in full:
        assert abs(full[k] - early[k]) < 0.05  # converged to the same fixpoint


def test_sample_filter_modes(spark):
    """P6 sampling filter: rate respected within tolerance; the
    content-keyed mode is identical across partition layouts."""
    from cis555_search_engine_spark.operators.curation import sample_filter

    df = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    n = sample_filter(df, rate=0.5, seed=1).count()
    assert 4500 <= n <= 5500, n
    a = {r["doc_id"] for r in sample_filter(df, 0.3, seed=7, id_col="doc_id").collect()}
    b = {r["doc_id"] for r in
         sample_filter(df.repartition(13), 0.3, seed=7, id_col="doc_id").collect()}
    assert a == b                       # layout-independent
    assert 2600 <= len(a) <= 3400, len(a)
    c = {r["doc_id"] for r in sample_filter(df, 0.3, seed=8, id_col="doc_id").collect()}
    assert a != c                       # seed actually matters


def test_jdbc_reader_surface(spark):
    """JDBC methods construct a partitioned reader (no DB in sandbox —
    load() must fail with a connection/driver error, not an API error)."""
    import pytest

    from cis555_search_engine_spark.catalog import Catalog

    cat = Catalog(spark=spark, root="/tmp")
    with pytest.raises(Exception) as ei:
        cat.read_jdbc(
            "jdbc:mysql://localhost:1/nope", "t",
            partition_column="id", lower_bound=0, upper_bound=10, num_partitions=2,
        ).count()
    msg = str(ei.value)
    assert "partitionColumn" not in msg, msg  # options accepted; failure is connectivity


def test_hits_matches_numpy_power_iteration(spark):
    """HITS hub/auth after 10 L1-normalized iterations equals the dense
    numpy power iteration on the same adjacency — including a dangling
    node (hub only) and an unreferenced node (auth 0)."""
    import numpy as np

    from cis555_search_engine_spark.operators.pagerank import hits

    # 0→1, 0→2, 1→2, 3→2, 2→0: node 3 has no in-links (auth 0 side),
    # and duplicate edge + self-loop must be dropped by clean_edges
    raw = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 0), (0, 2), (1, 1)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r["id"]: (r["hub"], r["auth"]) for r in hits(edges, n_iter=10).collect()}

    ids = [0, 1, 2, 3]
    A = np.zeros((4, 4))
    for s, d in set((s, d) for s, d in raw if s != d):
        A[ids.index(s), ids.index(d)] = 1.0
    a = np.ones(4)
    for _ in range(10):
        h = A @ a
        h = h / h.sum()
        a = A.T @ h
        a = a / a.sum()
    for i, nid in enumerate(ids):
        assert got[nid][0] == pytest.approx(h[i], abs=1e-9)
        assert got[nid][1] == pytest.approx(a[i], abs=1e-9)
    assert got[3][1] == 0.0  # never linked to

"""Similarity-search tests vs numpy oracles on real testdata."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_sdf(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb_sdf):
    rows = emb_sdf.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _cosine_matrix(mat):
    norms = np.linalg.norm(mat, axis=1)
    return (mat @ mat.T) / np.outer(norms, norms)


def test_bruteforce_topk_matches_numpy(emb_sdf, emb_np):
    from cis555_search_engine_spark.operators.similarity import ann_topk_bruteforce

    ids, mat = emb_np
    sims = _cosine_matrix(mat)
    q = 0
    cand = [(float(sims[q, t]), int(ids[t])) for t in range(len(ids)) if ids[t] != ids[q]]
    want = sorted(cand, key=lambda x: (-round(x[0], 6), x[1]))[:15]
    got = [(r["cos"], r["vec_id"]) for r in ann_topk_bruteforce(emb_sdf, 0, k=15).collect()]
    assert [v for _, v in got] == [v for _, v in want]
    for (gc, _), (wc, _) in zip(got, want):
        assert abs(gc - wc) < 1e-5


def test_cosine_pairs_match_numpy(emb_sdf, emb_np):
    from cis555_search_engine_spark.operators.similarity import cosine_near_dup_pairs

    ids, mat = emb_np
    sims = _cosine_matrix(mat)
    thr = 0.4
    want = {
        (int(ids[a]), int(ids[b])): sims[a, b]
        for a in range(len(ids))
        for b in range(a + 1, len(ids))
        if sims[a, b] >= thr
    }
    got = {(r["i"], r["j"]): r["cos"] for r in cosine_near_dup_pairs(emb_sdf, thr).collect()}
    assert set(got) == set(want)
    for p, c in got.items():
        assert abs(c - want[p]) < 1e-5
    assert want, "fixture must contain cosine pairs >= 0.4"


def test_ivf_exact_within_probed_cells_and_decent_recall(emb_sdf, emb_np):
    from cis555_search_engine_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf,
        assign_ivf_cells,
    )

    cents, assigned = assign_ivf_cells(emb_sdf, n_centroids=10)
    assigned = assigned.cache()
    got = [r["vec_id"] for r in ann_topk_ivf(
        emb_sdf, 0, k=10, n_probe=3, assigned=assigned, centroids=cents
    ).collect()]
    brute = [r["vec_id"] for r in ann_topk_bruteforce(emb_sdf, 0, k=10).collect()]
    recall = len(set(got) & set(brute)) / len(brute)
    assert recall >= 0.3, (recall, got, brute)

    # probing all cells == brute force exactly
    got_all = [r["vec_id"] for r in ann_topk_ivf(
        emb_sdf, 0, k=10, n_probe=10, assigned=assigned, centroids=cents
    ).collect()]
    assert got_all == brute


def test_ivf_assignment_is_argmax(emb_sdf, emb_np):
    from cis555_search_engine_spark.operators.similarity import assign_ivf_cells

    ids, mat = emb_np
    cents, assigned = assign_ivf_cells(emb_sdf, n_centroids=10)
    cent_rows = sorted(
        [(r["cent_id"], np.array(r["cvec"], dtype=np.float64)) for r in cents.collect()]
    )
    cmat = np.array([v for _, v in cent_rows])
    cids = np.array([c for c, _ in cent_rows])
    sims = (mat @ cmat.T) / np.outer(np.linalg.norm(mat, axis=1), np.linalg.norm(cmat, axis=1))
    want = {int(ids[i]): int(cids[np.argmax(sims[i])]) for i in range(len(ids))}
    got = {r["vec_id"]: r["cell"] for r in assigned.select("vec_id", "cell").collect()}
    # ties broken by lowest cent_id on both sides (argmax picks first max)
    assert got == want


def test_cosine_lsh_pairs_match_numpy(emb_sdf, emb_np):
    """Random-hyperplane LSH + exact verification must equal the exact
    all-pairs result at the 0.4 threshold (recall 1.0 on this corpus;
    miss probability ~1.6e-5 per boundary pair at these band params)."""
    from cis555_search_engine_spark.operators.similarity import cosine_lsh_pairs

    ids, mat = emb_np
    sims = _cosine_matrix(mat)
    thr = 0.4
    want = {
        (int(ids[a]), int(ids[b])): sims[a, b]
        for a in range(len(ids))
        for b in range(a + 1, len(ids))
        if sims[a, b] >= thr
    }
    got = {(r["i"], r["j"]): r["cos"] for r in cosine_lsh_pairs(emb_sdf, thr).collect()}
    assert set(got) == set(want)
    for p, c in got.items():
        assert abs(c - want[p]) < 1e-5
    assert want


def test_cosine_lsh_plan_has_no_nested_loop(emb_sdf):
    """The LSH candidate join must be an equi-join — the exact baseline's
    BroadcastNestedLoopJoin (cartesian) must not appear anywhere."""
    from cis555_search_engine_spark.operators.similarity import cosine_lsh_pairs
    from tests.test_plans import explain_str

    plan = explain_str(cosine_lsh_pairs(emb_sdf, 0.4), "simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmeans_ann_recall_and_full_probe(emb_sdf):
    """ann_topk_kmeans with all cells probed == brute force exactly;
    3-probe recall is reasonable; centroids actually move (not the
    seed vectors)."""
    from cis555_search_engine_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_kmeans,
        kmeans_quantized,
        quantized_vec_col,
    )
    from pyspark.sql import functions as F

    cents = kmeans_quantized(emb_sdf, k=8, n_iter=3)
    init = [
        list(r["vq"]) for r in emb_sdf.orderBy("vec_id").limit(8)
        .select(quantized_vec_col(F.col("embedding")).alias("vq")).collect()
    ]
    assert cents != init, "3 Lloyd iterations must move the centroids"
    brute = [r["vec_id"] for r in ann_topk_bruteforce(emb_sdf, 0, k=10).collect()]
    got_all = [r["vec_id"] for r in ann_topk_kmeans(
        emb_sdf, 0, k=10, n_centroids=8, n_probe=8, centroids=cents).collect()]
    assert got_all == brute
    got3 = [r["vec_id"] for r in ann_topk_kmeans(
        emb_sdf, 0, k=10, n_centroids=8, n_probe=3, centroids=cents).collect()]
    recall = len(set(got3) & set(brute)) / len(brute)
    assert recall >= 0.3, (recall, got3, brute)


def test_write_ivf_partition_pruning(spark, emb_sdf, tmp_path):
    """Persisted IVF assignment must prune at the directory level: the
    probe filter shows up as PartitionFilters on the parquet scan."""
    import re

    from cis555_search_engine_spark.operators.similarity import (
        kmeans_quantized,
        write_ivf,
    )
    from pyspark.sql import functions as F
    from tests.test_plans import explain_str

    cents = kmeans_quantized(emb_sdf, k=8, n_iter=2)
    path = str(tmp_path / "ivf")
    write_ivf(emb_sdf, path, cents)
    scan = spark.read.parquet(path).filter(F.col("cell").isin([0, 3]))
    plan = explain_str(scan, "simple")
    assert re.search(r"PartitionFilters: \[cell#\d+ IN \(0,3\)", plan), plan


def test_cosine_lsh_degenerate_bucket_capped(spark):
    """1k near-identical near-zero vectors land every row in the same
    band-buckets: without the hot-bucket cap the candidate join is a
    1M-row quadratic blob (VERDICT r2 scale hazard). With the cap the
    job completes, the hot buckets are dropped (logged), and precision
    stays exact on whatever survives."""
    from cis555_search_engine_spark.operators.similarity import cosine_lsh_pairs

    n = 1000
    rows = [(i, [1e-9, 1e-9, 1e-9, 1e-9]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_lsh_pairs(emb, threshold=0.4, max_bucket_df=100)
    got = out.collect()
    # every bucket holds all 1000 rows -> all dropped -> no candidates
    assert got == []
    # and with the cap off but a tiny corpus, pairs DO come back exact
    small = spark.createDataFrame(rows[:5], "vec_id long, embedding array<float>")
    pairs = cosine_lsh_pairs(small, threshold=0.4, max_bucket_df=None).collect()
    assert len(pairs) == 10  # all 5-choose-2 identical pairs
    assert all(abs(r["cos"] - 1.0) < 1e-6 for r in pairs)


def test_cosine_lsh_signature_staged_once(emb_sdf):
    """The staged bucket frame must appear as a checkpointed scan in the
    plan — NOT two ArrowEvalPython signature evaluations (round-2's
    double-eval regression: 10.1s)."""
    from cis555_search_engine_spark.operators.similarity import cosine_lsh_pairs

    plan = cosine_lsh_pairs(emb_sdf, threshold=0.4)._jdf.queryExecution().executedPlan().toString()
    # exactly ONE ArrowEvalPython: the pair-cosine verify UDF. The
    # signature UDF lives behind the eager localCheckpoint, so it can
    # never appear (let alone twice, the round-2 double-eval).
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_survives_null_and_ragged_vectors(spark):
    """ADVICE r2: a null/ragged embedding must not crash the clustering
    (cell=NULL group used to hit int(None) on the driver)."""
    from cis555_search_engine_spark.operators.similarity import kmeans_quantized

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
            (3, None), (4, [1.0, 2.0, 3.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_quantized(emb, k=2, n_iter=2)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)

    # the bad vectors sitting at the LOWEST ids must not poison the
    # k-seed collect either (round-3 review: `list(None)` TypeError);
    # dim is the MODAL length, so ragged rows are excluded from seeding
    # as well as from clustering even when they hold the lowest ids
    rows_low = [(0, None), (1, [9.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]),
                (4, [0.5, 0.5])]
    emb_low = spark.createDataFrame(rows_low, "vec_id long, embedding array<float>")
    cents_low = kmeans_quantized(emb_low, k=2, n_iter=2)
    assert len(cents_low) == 2 and all(len(c) == 2 for c in cents_low)


def test_ann_ivf_served_partition_pruned_plan(spark):
    """The DRIVER-visible serving query must scan the persisted IVF
    layout with PartitionFilters on `cell` (directory pruning), and
    match the in-memory kmeans path row-for-row."""
    from cis555_search_engine_spark import entry_queries as EQ

    out = EQ.q_ann_ivf_served(spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    served = [(r["vec_id"], r["cos"]) for r in out.collect()]
    want = [(r["vec_id"], r["cos"]) for r in EQ.q_ann_kmeans(spark, SF).collect()]
    assert served == want


def test_cosine_lsh_survives_null_first_row(spark):
    """VERDICT r3 item 6: the hyperplane dimensionality must come from
    the MODAL vector length, never row 0 — a null/ragged first row used
    to mis-size the hyperplane matrix and null every real signature."""
    from cis555_search_engine_spark.operators.similarity import cosine_lsh_pairs

    rows = [(0, None), (1, [3.0])] + [
        (i, [1.0 + 0.001 * i, 0.5, 0.25, 0.125]) for i in range(2, 12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_lsh_pairs(emb, threshold=0.9).collect()
    # the 10 well-formed near-identical vectors yield all 45 pairs;
    # the null and ragged rows contribute nothing and crash nothing
    assert len(got) == 45
    assert all(r["i"] >= 2 and r["j"] >= 2 for r in got)


def test_cosine_lsh_verify_join_not_hinted_broadcast(emb_sdf):
    """VERDICT r3 item 2: the exact-verify join must NOT force-broadcast
    the embeddings table (unbounded at 10⁹ rows). No ResolvedHint may
    survive in the analyzed plan — AQE may still CHOOSE broadcast for a
    genuinely small side, which is the point."""
    from cis555_search_engine_spark.operators.similarity import cosine_lsh_pairs

    analyzed = (
        cosine_lsh_pairs(emb_sdf, threshold=0.4)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ResolvedHint" not in analyzed, analyzed
    assert "UnresolvedHint" not in analyzed, analyzed


def test_lsh_band_params_adaptive():
    """Band width tracks log2(n); band count tracks width so the
    per-pair miss probability stays <= the target at the threshold —
    up to the MAX_LSH_BANDS feasibility cap (logged, tested
    separately), beyond which the count stays put at the cap."""
    import math

    from cis555_search_engine_spark.operators.similarity import (
        MAX_LSH_BANDS,
        lsh_band_params,
    )

    for n in (100, 10_000, 1_000_000, 10**9):
        b, nb = lsh_band_params(n, threshold=0.4)
        assert 4 <= b <= 16
        p = 1.0 - math.acos(0.4) / math.pi
        miss = (1.0 - p**b) ** nb
        if nb < MAX_LSH_BANDS:
            assert miss <= 1e-4 + 1e-12, (n, b, nb, miss)
        else:
            assert nb == MAX_LSH_BANDS  # infeasible combo: capped, disclosed
    # monotone width growth with n, clamped
    widths = [lsh_band_params(n, 0.4)[0] for n in (10**3, 10**6, 10**9, 10**12)]
    assert widths == sorted(widths)
    assert widths[-1] == 16


def test_lsh_band_params_caps_infeasible_band_counts():
    """Low threshold x wide bands: the recall-preserving band count is
    infeasible (1e4+ bands at n=1e9, threshold 0.4) — the params must
    cap at MAX_LSH_BANDS (logged, not silent) instead of emitting a
    signature that multiplies every downstream shuffle by 10^4."""
    from cis555_search_engine_spark.operators.similarity import (
        MAX_LSH_BANDS,
        lsh_band_params,
    )

    bits, bands = lsh_band_params(10**9, 0.4)
    assert bands == MAX_LSH_BANDS
    # feasible regimes stay uncapped and recall-preserving
    bits_hi, bands_hi = lsh_band_params(10**9, 0.9)
    assert bands_hi < MAX_LSH_BANDS
    p = 1.0 - __import__("math").acos(0.9) / __import__("math").pi
    assert (1 - p**bits_hi) ** bands_hi <= 1e-4


def test_mmr_rerank_greedy_semantics(spark):
    """Hand-checked greedy MMR: pick 1 = relevance argmax; pick 2 must
    skip a near-duplicate of pick 1 in favor of a diverse lower-rel
    candidate; mmr values match the closed-form trade-off under the
    min-max relevance normalization."""
    import pytest as _pytest

    from cis555_search_engine_spark.operators.similarity import mmr_rerank

    # doc 1: top rel; doc 2: identical vector to doc 1, rel close;
    # doc 3: orthogonal vector, lower rel; doc 4: min-rel anchor
    cand = spark.createDataFrame(
        [(1, 10.0), (2, 9.0), (3, 6.0), (4, 1.0)], "doc_id long, rel double"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = mmr_rerank(cand, emb, k=3, lam=0.7).collect()
    order = [(r["doc_id"], r["step"]) for r in rows]
    # rel_n = [1, 8/9, 5/9, 0]; step 2: doc 3 (0.7·5/9, diverse) beats
    # doc 2 (0.7·8/9 − 0.3·1.0, duplicate of pick 1)
    assert order == [(1, 1), (3, 2), (2, 3)]
    got = {r["doc_id"]: r["mmr"] for r in rows}
    assert got[1] == _pytest.approx(0.7 * 1.0)
    assert got[3] == _pytest.approx(0.7 * 5 / 9)
    assert got[2] == _pytest.approx(0.7 * 8 / 9 - 0.3 * 1.0)


def test_mmr_rerank_negative_and_constant_relevance(spark):
    """Dirichlet-LM relevance is a NEGATIVE log-probability: min-max
    normalization must keep the ordering (the old rel/max(rel) silently
    inverted it); all-equal rel degenerates to rel_n = 1.0, not NaN."""
    from cis555_search_engine_spark.operators.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    neg = spark.createDataFrame(
        [(1, -1.0), (2, -2.0), (3, -3.0)], "doc_id long, rel double"
    )
    rows = mmr_rerank(neg, emb, k=1, lam=0.7).collect()
    assert rows[0]["doc_id"] == 1  # the LEAST negative = most relevant
    const = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 0.0)], "doc_id long, rel double"
    )
    rows = mmr_rerank(const, emb, k=3, lam=0.7).collect()
    import math

    assert all(not math.isnan(r["mmr"]) for r in rows)
    assert rows[0]["mmr"] == 0.7  # rel_n degenerates to 1.0


def test_mmr_rerank_bounds_and_empty(spark):
    from cis555_search_engine_spark.operators.similarity import mmr_rerank

    emb = spark.range(5).selectExpr(
        "id as vec_id", "array(cast(id as float), 1.0f) as embedding"
    )
    cand = spark.range(5).selectExpr("id as doc_id", "cast(id + 1 as double) as rel")
    # k larger than n: returns all n, steps 1..n
    rows = mmr_rerank(cand, emb, k=50, lam=0.5).collect()
    assert sorted(r["step"] for r in rows) == [1, 2, 3, 4, 5]
    # empty candidate frame: empty result, stable schema
    out = mmr_rerank(cand.filter("doc_id < 0"), emb, k=3)
    assert out.columns == ["doc_id", "step", "mmr"] and out.count() == 0
    # unbounded-input guard trips
    big = spark.range(20).selectExpr("id as doc_id", "1.0 as rel")
    bigemb = spark.range(20).selectExpr("id as vec_id", "array(1.0f) as embedding")
    try:
        mmr_rerank(big, bigemb, k=2, max_candidates=10)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_mmr_rerank_string_ids(spark):
    """Doc keys are strings at corpus scale (conv_id:turn_idx) — the
    rerank must preserve the caller's id type end-to-end."""
    from cis555_search_engine_spark.operators.similarity import mmr_rerank

    cand = spark.createDataFrame(
        [("c1:0", 10.0), ("c1:1", 9.0), ("c2:0", 8.0), ("c3:0", 1.0)],
        "doc_id string, rel double",
    )
    emb = spark.createDataFrame(
        [
            ("c1:0", [1.0, 0.0]),
            ("c1:1", [1.0, 0.0]),
            ("c2:0", [0.0, 1.0]),
            ("c3:0", [1.0, 1.0]),
        ],
        "doc_id string, embedding array<float>",
    )
    out = mmr_rerank(cand, emb, k=3, id_col="doc_id", emb_id_col="doc_id")
    assert dict(out.dtypes)["doc_id"] == "string"
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == ["c1:0", "c2:0", "c1:1"]


def test_pq_train_matches_per_subspace_kmeans(emb_sdf):
    """The fused trainer must be bit-identical to m independent
    kmeans_quantized runs over the slices (the SQL twin's shape)."""
    from cis555_search_engine_spark.operators.similarity import (
        kmeans_quantized,
        pq_train,
    )
    from pyspark.sql import functions as F

    m, ks, n_iter, sub = 4, 8, 2, 16
    books = pq_train(emb_sdf, m=m, ks=ks, n_iter=n_iter)
    assert len(books) == m and all(len(b) == ks for b in books)
    assert all(len(c) == sub for b in books for c in b)
    for j in range(m):
        want = kmeans_quantized(
            emb_sdf.select(
                "vec_id", F.slice("embedding", j * sub + 1, sub).alias("embedding")
            ),
            k=ks, n_iter=n_iter,
        )
        assert books[j] == want, f"subspace {j} diverged from reference kmeans"


def test_pq_encode_is_argmax_and_compact(emb_sdf, emb_np):
    """Codes = per-subspace argmax cosine vs the codebook (numpy oracle);
    the encoded frame carries only id + m small ints."""
    from cis555_search_engine_spark.operators.similarity import pq_encode, pq_train

    m, ks, sub = 4, 8, 16
    books = pq_train(emb_sdf, m=m, ks=ks, n_iter=2)
    codes = pq_encode(emb_sdf, books)
    assert codes.columns == ["vec_id", "code_0", "code_1", "code_2", "code_3"]
    got = {r["vec_id"]: [r[f"code_{j}"] for j in range(m)] for r in codes.collect()}

    ids, mat = emb_np
    q = np.round(mat * 1000).astype(np.int64)
    for j in range(m):
        C = np.array(books[j], dtype=np.int64)
        S = q[:, j * sub:(j + 1) * sub]
        sims = (S @ C.T) / (
            np.linalg.norm(S.astype(np.float64), axis=1)[:, None]
            * np.linalg.norm(C.astype(np.float64), axis=1)[None, :]
        )
        want = sims.argmax(axis=1)  # numpy argmax ties -> first == lowest cid
        for i, vid in enumerate(ids):
            assert got[int(vid)][j] == int(want[i])


def test_pq_topk_adc_recall_vs_bruteforce(emb_sdf):
    """Two-stage PQ (ADC shortlist + exact re-rank) must keep strong
    overlap with the exact top-10, return exactly k rows, be
    deterministic across runs, and every returned cos must equal the
    brute-force cos for that id (the re-rank is EXACT)."""
    from cis555_search_engine_spark.operators.similarity import (
        ann_topk_bruteforce,
        pq_topk,
    )

    brute = {
        r["vec_id"]: r["cos"]
        for r in ann_topk_bruteforce(emb_sdf, 0, k=1 << 20).collect()
    }
    brute_top = sorted(brute, key=lambda i: (-brute[i], i))[:10]
    got1 = pq_topk(emb_sdf, 0, k=10, shortlist=100, m=8, ks=8, n_iter=2).collect()
    got2 = pq_topk(emb_sdf, 0, k=10, shortlist=100, m=8, ks=8, n_iter=2).collect()
    assert got1 == got2
    assert len(got1) == 10
    for r in got1:
        assert r["cos"] == brute[r["vec_id"]]  # exact re-rank
    recall = len({r["vec_id"] for r in got1} & set(brute_top)) / 10
    assert recall >= 0.6, (recall, [r["vec_id"] for r in got1], brute_top)


def test_pq_topk_absent_query_and_bad_dim(spark):
    from cis555_search_engine_spark.operators.similarity import pq_topk, pq_train

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(1, 20)],
        "vec_id long, embedding array<float>",
    )
    out = pq_topk(emb, query_vec_id=999, k=5, shortlist=10, m=4, ks=4, n_iter=1)
    assert out.collect() == []
    with pytest.raises(ValueError):
        pq_train(emb, m=3, ks=4, n_iter=1)  # 8 % 3 != 0


def test_pq_train_survives_ragged_and_few_vectors(spark):
    """Round-5 review findings: a vector longer than the modal dim must
    not kill the fused trainer (ANSI element_at), and fewer than ks
    full-dim vectors must degrade to fewer centroids like
    kmeans_quantized — not IndexError."""
    from cis555_search_engine_spark.operators.similarity import pq_train

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(1, 20)]
    rows.append((99, [1.0] * 10))  # ragged: longer than modal dim 8
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(emb, m=2, ks=4, n_iter=1)
    assert len(books) == 2 and all(len(b) == 4 for b in books)

    small = spark.createDataFrame(rows[:5], "vec_id long, embedding array<float>")
    books = pq_train(small, m=2, ks=8, n_iter=1)  # only 5 seeds available
    assert all(len(b) == 5 for b in books)


def test_pq_shortlist_rejects_codes_without_codebooks(spark):
    from cis555_search_engine_spark.operators.similarity import (
        pq_encode,
        pq_shortlist,
        pq_train,
    )

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(1, 20)],
        "vec_id long, embedding array<float>",
    )
    books = pq_train(emb, m=2, ks=4, n_iter=1)
    codes = pq_encode(emb, books)
    with pytest.raises(ValueError, match="codebooks"):
        pq_shortlist(emb, 1, codes=codes)

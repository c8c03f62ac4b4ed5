"""Dedup operator tests vs pure-Python oracles on real testdata."""

from __future__ import annotations

import itertools

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_sdf(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_rows(docs_sdf):
    return [(r["doc_id"], r["text"]) for r in docs_sdf.select("doc_id", "text").collect()]


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard_pairs(docs_rows, threshold, n=3):
    sh = {i: _shingles(t, n) for i, t in docs_rows}
    out = {}
    for (i, a), (j, b) in itertools.combinations(sorted(sh.items()), 2):
        if not a or not b:
            continue
        inter = len(a & b)
        if inter == 0:
            continue
        jac = inter / len(a | b)
        if jac >= threshold:
            out[(i, j)] = jac
    return out


def test_exact_dedup_matches_oracle(docs_sdf, docs_rows):
    from cis555_search_engine_spark.operators.dedup import exact_dedup

    groups: dict[str, list[int]] = {}
    for i, t in docs_rows:
        key = " ".join(sorted(set(t.split())))
        groups.setdefault(key, []).append(i)
    want = set()
    for ids in groups.values():
        if len(ids) > 1:
            rep = min(ids)
            want |= {(rep, d) for d in ids if d != rep}
    got = {(r["rep_id"], r["dup_id"]) for r in exact_dedup(docs_sdf).collect()}
    assert got == want
    assert want, "fixture must contain duplicate token-set groups"


@pytest.mark.parametrize("threshold", [0.9, 0.5])
def test_ngram_jaccard_matches_oracle(docs_sdf, docs_rows, threshold):
    from cis555_search_engine_spark.operators.dedup import ngram_jaccard_pairs

    want = _jaccard_pairs(docs_rows, threshold)
    got = {(r["i"], r["j"]): r["jac"] for r in ngram_jaccard_pairs(docs_sdf, threshold).collect()}
    assert set(got) == set(want)
    for p, jac in got.items():
        assert abs(jac - want[p]) < 1e-5
    assert want, f"fixture must contain pairs >= {threshold}"


def test_minhash_lsh_full_recall_at_threshold(docs_sdf, docs_rows):
    from cis555_search_engine_spark.operators.dedup import minhash_lsh_pairs

    want = _jaccard_pairs(docs_rows, 0.9)
    got = {(r["i"], r["j"]): r["jac"] for r in minhash_lsh_pairs(docs_sdf, 0.9).collect()}
    # exact verification removes false positives; banding must not lose
    # any true pair at this threshold on this corpus
    assert set(got) == set(want)
    assert want


def test_simhash_properties(spark):
    from cis555_search_engine_spark.operators.dedup import simhash60, simhash_pairs

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "zeta alpha theta beta eta gamma epsilon delta"),  # permutation -> same tf
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # one token swapped
        (3, "completely different words entirely unrelated content here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sims = {r["id"]: r["simhash"] for r in simhash60(df).collect()}
    assert sims[0] == sims[1]  # tf-multiset identical -> identical simhash
    ham = lambda a, b: bin((a ^ b) & (2**60 - 1)).count("1")  # noqa: E731
    assert ham(sims[0], sims[2]) < ham(sims[0], sims[3])
    pairs = {(r["i"], r["j"]): r["hamming"] for r in simhash_pairs(df, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0


def test_simhash_pairs_complete_vs_bruteforce(docs_sdf):
    """Chunk-join candidate generation must find every pair with
    Hamming <= 3 (pigeonhole over 3-of-6 10-bit chunk combinations)."""
    from cis555_search_engine_spark.operators.dedup import simhash60, simhash_pairs

    sims = {r["id"]: r["simhash"] for r in simhash60(docs_sdf).collect()}
    ham = lambda a, b: bin((a ^ b) & (2**60 - 1)).count("1")  # noqa: E731
    want = {
        (i, j): ham(si, sj)
        for (i, si), (j, sj) in itertools.combinations(sorted(sims.items()), 2)
        if ham(si, sj) <= 3
    }
    got = {(r["i"], r["j"]): r["hamming"] for r in simhash_pairs(docs_sdf, 3).collect()}
    assert got == want


def test_short_docs_do_not_crash_dedup(spark):
    """Docs with < n tokens must yield empty shingle sets (regression:
    sequence(0, size-n) counted DOWN for short docs and hit an ANSI
    element_at error) and must not pair with each other."""
    from pyspark.sql import functions as F

    from cis555_search_engine_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        shingles_col,
        simhash_pairs,
    )

    rows = [
        (0, "one"),
        (1, "two words"),
        (2, "three tokens here"),
        (3, "alpha beta gamma delta epsilon"),
        (4, "alpha beta gamma delta epsilon"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["s"] for r in df.select("doc_id", shingles_col(n=3).alias("s")).collect()}
    assert sh[0] == [] and sh[1] == [] and sh[5] == []
    assert sh[2] == ["three tokens here"]
    jac = {(r["i"], r["j"]) for r in ngram_jaccard_pairs(df, 0.5).collect()}
    assert jac == {(3, 4)}
    lsh = {(r["i"], r["j"]) for r in minhash_lsh_pairs(df, 0.9).collect()}
    assert lsh == {(3, 4)}
    # simhash over tokens (not shingles): doc 0/1 survive; empty doc 5 must not crash
    simhash_pairs(df, 3).collect()


def test_jaccard_hot_shingle_cap_sizes(spark):
    """With the cap active, Jaccard must be exact over the KEPT shingle
    sets (sizes computed after the cap, not before)."""
    from cis555_search_engine_spark.operators.dedup import ngram_jaccard_pairs

    hot = "the terms of service apply"  # shingles shared by every doc
    rows = [(i, f"{hot} unique{i} filler{i} text{i} body{i}") for i in range(4)]
    rows += [(10, f"{hot} same tail words here"), (11, f"{hot} same tail words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap of 3: every shingle of `hot` appears in 6 docs -> dropped
    got = {(r["i"], r["j"]): r["jac"] for r in ngram_jaccard_pairs(df, 0.9, max_shingle_df=3).collect()}
    # docs 10/11 share ALL kept shingles -> jac exactly 1.0 over kept sets
    assert set(got) == {(10, 11)}
    assert abs(got[(10, 11)] - 1.0) < 1e-9


def test_exact_dedup_verbatim_mode(spark):
    """canonical=False keys on the byte-level text: reordered docs are
    NOT duplicates (they are under the default bag-of-words key)."""
    from cis555_search_engine_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the cat"),
            (2, "on sat the cat"),
            (3, "the cat sat on the cat"),
        ],
        ["doc_id", "text"],
    )
    bow = {(r["rep_id"], r["dup_id"]) for r in exact_dedup(df).collect()}
    assert bow == {(1, 2), (1, 3)}  # all three share the token set
    verbatim = {(r["rep_id"], r["dup_id"]) for r in exact_dedup(df, canonical=False).collect()}
    assert verbatim == {(1, 3)}  # only the byte-identical pair


def test_minhash_rejects_degenerate_band_params(spark, tmp_path):
    import pytest as _pytest

    from cis555_search_engine_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(df, bands=64)  # r would be 0 -> all-pairs blow-up
    with _pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(df, bands=12, num_hashes=32)  # silent tail drop


def test_simhash_rejects_radius_beyond_pigeonhole(spark):
    import pytest as _pytest

    from cis555_search_engine_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="exact radius"):
        simhash_pairs(df, max_hamming=4)


def test_cluster_representatives_policy(spark):
    """Best-score wins; min-id breaks ties; singletons represent
    themselves; cluster_size counts every member."""
    from cis555_search_engine_spark.operators.dedup import cluster_representatives

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    # {1,2,3} one cluster (chain edge 1-2, 2-3); {5,6} tie cluster; 4, 7 singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["i", "j"])
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.7), (4, 0.1), (5, 0.8), (6, 0.8), (7, 0.0)],
        ["id", "score"],
    )
    got = {
        r["comp"]: (r["rep_id"], r["rep_score"], r["cluster_size"])
        for r in cluster_representatives(docs, pairs, scores).collect()
    }
    assert got == {
        1: (2, 0.9, 3),  # best quality wins over min id
        5: (5, 0.8, 2),  # score tie -> min id
        4: (4, 0.1, 1),  # singletons: own representative
        7: (7, 0.0, 1),
    }


def test_cluster_representatives_partial_scores(spark):
    """Docs missing from the scores frame (or null-scored) still count
    as members and lose to any scored member; an all-unscored cluster
    keeps its min-id doc with a null rep_score instead of vanishing."""
    from cis555_search_engine_spark.operators.dedup import cluster_representatives

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    # {1,2}: 2 scored, 1 missing; {3,4}: both missing; {5}: null score; {6}: scored
    pairs = spark.createDataFrame([(1, 2), (3, 4)], ["i", "j"])
    scores = spark.createDataFrame(
        [(2, 0.4), (5, None), (6, 0.9)], "id long, score double"
    )
    got = {
        r["comp"]: (r["rep_id"], r["rep_score"], r["cluster_size"])
        for r in cluster_representatives(docs, pairs, scores).collect()
    }
    assert got == {
        1: (2, 0.4, 2),     # scored member beats the unscored one
        3: (3, None, 2),    # all-unscored cluster survives, min id, null score
        5: (5, None, 1),    # null score == unscored
        6: (6, 0.9, 1),
    }


def test_cluster_representatives_giant_cluster(spark):
    """The all-identical worst case: one cluster spanning every doc must
    produce exactly one representative (hash-agg path, no per-cluster
    window partition to pin)."""
    from cis555_search_engine_spark.operators.dedup import cluster_representatives

    n = 500
    docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["i", "j"])
    scores = spark.createDataFrame([(i, float(i % 7)) for i in range(n)], ["id", "score"])
    rows = cluster_representatives(docs, pairs, scores).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["comp"], r["rep_id"], r["rep_score"], r["cluster_size"]) == (0, 6, 6.0, n)

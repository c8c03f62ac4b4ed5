"""BPE trainer vs the reference single-process algorithm (Sennrich et
al. ACL 2016, Algorithm 1) — merge-table equality, greedy-overlap
semantics, segmentation, and degenerate inputs."""

from __future__ import annotations

from collections import Counter

import pytest


def _py_bpe(vocab: dict[str, int], k: int):
    """Reference implementation: dict loop, greedy left-to-right merge."""
    v = {tuple(list(t) + ["</w>"]): c for t, c in vocab.items()}
    out = []
    for step in range(1, k + 1):
        pc: Counter = Counter()
        for syms, c in v.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((step, a, b, a + b, c))
        nv: dict[tuple, int] = {}
        for syms, cc in v.items():
            ns, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            nv[tuple(ns)] = nv.get(tuple(ns), 0) + cc
        v = nv
    return out


VOCAB = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2, "co-op": 1}


def test_bpe_train_matches_reference(spark):
    from cis555_search_engine_spark.operators.bpe import bpe_train

    words = spark.createDataFrame(list(VOCAB.items()), "term string, cnt long")
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in bpe_train(words, n_merges=8).orderBy("step").collect()
    ]
    assert got == _py_bpe(VOCAB, 8)
    # the aaaa case proves greedy non-overlapping semantics: pair (a,a)
    # counts 3 occurrences per word pre-merge, and merging yields aa aa
    assert any(m[3] == "aa" for m in got)


def test_bpe_train_on_real_wordcount_matches_reference(spark, corpus_sdf):
    """End-to-end over the fixture corpus' actual wordcount (includes
    hyphenated and edge tokens)."""
    from cis555_search_engine_spark.operators.bpe import bpe_train
    from cis555_search_engine_spark.operators.index_build import tokenize_turns
    from pyspark.sql import functions as F

    wc = (
        tokenize_turns(corpus_sdf)
        .groupBy(F.col("raw_term").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    vocab = {r["term"]: r["cnt"] for r in wc.collect()}
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in bpe_train(wc, n_merges=6).orderBy("step").collect()
    ]
    assert got == _py_bpe(vocab, 6)


def test_bpe_segment_applies_merges_in_order(spark):
    from cis555_search_engine_spark.operators.bpe import bpe_segment, bpe_train

    words = spark.createDataFrame(list(VOCAB.items()), "term string, cnt long")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(words, n_merges=8).orderBy("step").collect()
    ]
    seg = {
        r["term"]: r["subwords"]
        for r in bpe_segment(words, merges).collect()
    }
    assert seg["aaaa"] == ["aa", "aa", "</w>"]
    # every segmentation reassembles the original word + marker
    for term, subs in seg.items():
        assert "".join(subs) == term + "</w>"


def test_bpe_train_degenerate_inputs(spark):
    from cis555_search_engine_spark.operators.bpe import bpe_train

    # single-char words: only pairs with </w> exist; after they merge,
    # training stops early instead of erroring
    words = spark.createDataFrame([("a", 3), ("b", 1)], "term string, cnt long")
    got = bpe_train(words, n_merges=10).collect()
    assert [(r["left_sym"], r["right_sym"]) for r in got] == [("a", "</w>"), ("b", "</w>")]

    empty = spark.createDataFrame([], "term string, cnt long")
    assert bpe_train(empty, n_merges=3).collect() == []


def test_bpe_segment_survives_deep_merge_tables(spark):
    """Review finding: a realistic (30k+) merge table must not overflow
    Catalyst's expression converter — merges apply in checkpointed
    batches. 2,000 no-op merges + the real ones must still segment
    correctly."""
    from cis555_search_engine_spark.operators.bpe import bpe_segment, bpe_train

    words = spark.createDataFrame(list(VOCAB.items()), "term string, cnt long")
    real = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(words, n_merges=8).orderBy("step").collect()
    ]
    deep = real + [(f"x{i}", f"y{i}") for i in range(2000)]  # no-op tail
    seg = {r["term"]: r["subwords"] for r in bpe_segment(words, deep, batch=64).collect()}
    assert seg["aaaa"] == ["aa", "aa", "</w>"]
    for term, subs in seg.items():
        assert "".join(subs) == term + "</w>"


def test_bpe_subword_counts_conserve_mass(spark, corpus_sdf):
    """Retokenizing under the learned vocab must conserve the corpus:
    every word's subwords reassemble it, so total char mass (incl. the
    </w> marker) and total word occurrences are invariant."""
    from cis555_search_engine_spark.operators.bpe import bpe_segment, bpe_train
    from cis555_search_engine_spark.operators.index_build import tokenize_turns
    from pyspark.sql import functions as F

    wc = (
        tokenize_turns(corpus_sdf)
        .groupBy(F.col("raw_term").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(wc, n_merges=6).orderBy("step").collect()
    ]
    sub = (
        bpe_segment(wc, merges)
        .select(F.explode("subwords").alias("s"), "cnt")
        .groupBy("s").agg(F.sum("cnt").alias("c"))
    )
    got_chars = sub.select(F.sum(F.length("s") * F.col("c"))).first()[0]
    want_chars = wc.select(F.sum((F.length("term") + 4) * F.col("cnt"))).first()[0]
    assert got_chars == want_chars
    # the </w> marker appears exactly once per word occurrence, merged or not
    eow_mass = (
        sub.filter(F.col("s").endswith("</w>")).select(F.sum("c")).first()[0]
    )
    assert eow_mass == wc.select(F.sum("cnt")).first()[0]

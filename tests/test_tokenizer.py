"""Tokenizer golden cases (FIXTURES.md §6) + three-way implementation parity."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cis555_search_engine_spark.functions.tokenizer import (
    tokenize_col,
    tokenize_py,
    tokenize_udf,
)

GOLDEN = [
    ("Rice-Noodle, soup!", ["rice-noodle", "soup"]),
    ("--zoom!", ["zoom"]),
    ("covid-19 cases", ["covid", "cases"]),
    ("12345 6-7", []),
    ("a", ["a"]),
    ("", []),
    ("--", []),
    ("-a-", ["a"]),
    ("don't stop", ["don", "t", "stop"]),
    ("A  B\tc", ["a", "b", "c"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_py(text, expected):
    assert tokenize_py(text) == expected


def test_golden_spark_native_and_udf(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(GOLDEN)), "text": [t for t, _ in GOLDEN]})
    )
    out = (
        df.select("id", tokenize_col(F.col("text")).alias("nat"), tokenize_udf(F.col("text")).alias("udf"))
        .orderBy("id")
        .collect()
    )
    for row, (_, expected) in zip(out, GOLDEN):
        assert list(row["nat"]) == expected
        assert list(row["udf"]) == expected


@given(st.lists(st.text(alphabet=st.characters(codec="ascii"), max_size=20), max_size=8))
@settings(max_examples=50, deadline=None)
def test_py_udf_same_logic(texts):
    # pandas-UDF inner function must equal the pure-Python oracle
    ser = pd.Series(texts, dtype=object)
    udf_fn = tokenize_udf.func  # underlying pandas function
    assert list(udf_fn(ser)) == [tokenize_py(t) for t in texts]


def test_native_matches_py_on_corpus(spark, corpus_pdf):
    from pyspark.sql import functions as F

    sample = corpus_pdf.head(200)
    df = spark.createDataFrame(sample[["text"]])
    got = [list(r[0]) for r in df.select(tokenize_col(F.col("text"))).collect()]
    want = [tokenize_py(t) for t in sample["text"]]
    assert got == want

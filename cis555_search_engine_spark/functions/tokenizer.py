"""Tokenizer — single spec, three implementations (pure-Python oracle,
vectorized pandas UDF, native Spark SQL expression).

Reference semantics (``indexer/Indexer.java:345-392`` accumulate runs of
``[A-Za-z-]``, lowercase at ``:350``; ``:265-292`` ``stemWord`` trims
non-letters from both ends and drops tokens with no letter left):

1. tokens = maximal runs of ``[A-Za-z-]`` in the raw text (any other
   character, including digits, is a separator),
2. lowercase,
3. strip leading/trailing non-letters (after step 1 the only non-letter
   inside a token is ``-``),
4. drop the token if nothing remains.

Golden cases (FIXTURES.md §6):
  "Rice-Noodle, soup!"  -> ["rice-noodle", "soup"]
  "--zoom!"             -> ["zoom"]
  "covid-19 cases"      -> ["covid", "cases"]
  "12345 6-7"           -> []
  "a"                   -> ["a"]

Positions are 0-based indexes into the *kept* token sequence of a
document (tokens dropped by rule 4 do not consume a position).

The native-SQL variant exists because the whole spec is expressible with
``regexp_extract_all`` + ``trim`` — JVM-side, whole-stage-codegen'd, no
Python at all. It is the default for the batch index build; the pandas
UDF remains as the declared vectorized-UDF surface (north rule) and is
property-tested equal to both others.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"[a-z-]+")


def tokenize_py(text: str | None) -> list[str]:
    """Pure-Python oracle tokenizer (reference semantics)."""
    if not text:
        return []
    out = []
    for run in _TOKEN_RE.findall(text.lower()):
        tok = run.strip("-")
        if tok:
            out.append(tok)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer: Series[str] -> Series[list[str]]."""
    def one(text):
        if not isinstance(text, str) or not text:
            return []
        return [t for t in (r.strip("-") for r in _TOKEN_RE.findall(text.lower())) if t]

    return texts.map(one)


def tokenize_col(text: Column) -> Column:
    """Native (JVM/codegen) tokenizer: Column[str] -> Column[array<str>].

    Same spec as :func:`tokenize_py`; used on the hot path so tokenization
    never leaves the JVM.
    """
    runs = F.regexp_extract_all(F.lower(text), F.lit("[a-z-]+"), 0)
    trimmed = F.transform(runs, lambda r: F.regexp_replace(r, r"^-+|-+$", ""))
    return F.filter(trimmed, lambda t: t != F.lit(""))


# DuckDB fragment computing the same token list from a text column; used by
# the __spark_entry__ oracle SQL. {col} is the text column expression.
DUCKDB_TOKENS_SQL = (
    "list_filter(list_transform(regexp_extract_all(lower({col}), '[a-z-]+'),"
    " t -> trim(t, '-')), t -> t <> '')"
)

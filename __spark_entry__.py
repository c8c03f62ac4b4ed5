"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over documents at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2; definitions live in
``cis555_search_engine_spark/entry_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cis555_search_engine_spark import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-k with metadata join on sf0.001."""
    return EQ.q_topk_join_meta(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)

"""Result export + pagination (SURVEY §2.1 S9, §2.6 T4).

- `export_csv`: chunked CSV dump of a query result — the reference wrote
  1M-row CSV chunks for its pagerank experiments
  (`pagerank/ExperimentResults.java:20-58`); here one distributed write
  with a per-file row target.
- `paginate`: the frontend's result paging — `(pageNum-1)*perPage`
  slicing of a small collected top-k (`frontend/XPathApp.java:96-173`).
  Top-k lists are tiny (k <= 80), so paging is a driver-side slice; the
  distributed variant (offset paging over big results) is provided via
  row_number for completeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def export_csv(
    df: DataFrame, path: str, max_rows_per_file: int = 1_000_000, header: bool = True
) -> None:
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_rows_per_file)
        .option("header", str(header).lower())
        .csv(path)
    )


def paginate(rows: list, page: int, per_page: int = 10) -> list:
    """Driver-side page slice of a collected top-k (1-based pages;
    page < 1 is a caller error — Python's negative-slice arithmetic
    would otherwise serve rows from the END of the list as a 'page')."""
    if page < 1:
        raise ValueError(f"page is 1-based, got {page}")
    start = (page - 1) * per_page
    return rows[start : start + per_page]


def paginate_df(df: DataFrame, order_cols: list[str], page: int, per_page: int = 10) -> DataFrame:
    """Distributed offset paging via row_number (for large result sets;
    note: a global window — only for results already reduced to one
    partitionable ordering, not for raw 100 TB scans).

    ``order_cols`` must be a TOTAL order (include a unique key as the
    last column): row_number breaks ties by partition read order, which
    is not stable across jobs — with a non-total order, two pages
    fetched as two jobs can overlap or skip the tied rows.
    """
    if page < 1:
        raise ValueError(f"page is 1-based, got {page}")
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    start = (page - 1) * per_page
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > start) & (F.col("_rn") <= start + per_page))
        .drop("_rn")
    )

"""PII scrubbing: redact emails / IPv4 addresses / phone numbers from a
text corpus, with per-document match counts.

The training-data-pipeline step between curation and tokenization: a
100 TB web corpus carries contact lines, server logs, and signatures
that must not reach the model verbatim. This is the regex tier of PII
removal (the same tier C4 / Gopher / Dolma apply before any learned
NER pass): pattern classes that are precise enough to redact blindly.

Everything is native `regexp_count` / `regexp_replace` column
expressions — one corpus scan, zero shuffles, zero Python UDFs — so the
operator runs inside whole-stage codegen and scales as a pure map over
any partitioning. Semantics, fixed so the SQL twin cannot drift:

- counts are per-pattern over the ORIGINAL text (independent, not
  order-dependent);
- redaction applies the patterns SEQUENTIALLY in `PII_PATTERNS` order
  (email → ipv4 → phone), so a pattern never re-matches inside an
  earlier placeholder (placeholders contain no digits or ``@``).

The patterns deliberately use only constructs with identical semantics
in Java regex (Spark), RE2 (DuckDB oracle), and Python `re` (tests):
character classes, bounded repetition, and ``\\b`` word boundaries — no
backreferences or lookaround.

Reference parity: the reference engine stores and serves raw crawled
text (indexer/README.md, report p.3) with no scrubbing pass; this
operator is part of the training-data tier this repo adds on top
(SURVEY §6), alongside dedup / decontamination / sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — order is the redaction order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b\d{3}-\d{3}-\d{4}\b",
        "<PHONE>",
    ),
]


def scrub_text_cols(text_col: str = "text"):
    """(clean, n_pii) column pair over `text_col` — the in-place form
    for callers that rewrite text without reshaping the frame (the
    pipeline job applies both in ONE projection via `withColumns`, so
    the count sees the pre-redaction text). `clean` is the sequentially
    redacted text; `n_pii` the total original-text match count."""
    text = F.col(text_col)
    clean = text
    total = None
    for _name, pattern, token in PII_PATTERNS:
        c = F.regexp_count(text, F.lit(pattern)).cast("long")
        total = c if total is None else total + c
        clean = F.regexp_replace(clean, pattern, token)
    return clean, total


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, clean_text, n_email, n_ipv4, n_phone, n_pii) per document.

    `clean_text` is `text_col` with every pattern occurrence replaced
    by its typed placeholder; `n_*` count matches of each class in the
    original text; `n_pii` is their sum (the per-doc scrub-rate signal
    a pipeline thresholds on — documents that are MOSTLY PII are
    usually rosters or logs and get dropped rather than redacted).
    """
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pattern)).cast("long").alias(f"n_{name}")
        for name, pattern, _token in PII_PATTERNS
    ]
    clean, total = scrub_text_cols(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        clean.alias("clean_text"),
        *counts,
        total.alias("n_pii"),
    )

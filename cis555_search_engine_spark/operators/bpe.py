"""Distributed BPE subword-vocabulary induction (Sennrich et al., ACL
2016 — public literature).

The reference engine tokenizes with a fixed char-class regex
(`tokenizer/Tokenizer.java` analog, SURVEY §2.2 P2); a training-data
pipeline additionally LEARNS a subword vocabulary from the corpus — the
byte-pair-encoding merge table every modern tokenizer ships. The
classic implementation is a single-process dict loop over the word
counts; at 10^8+ distinct words that is the driver-side bottleneck this
operator removes: each merge iteration is ONE Spark job over the
(word, count) frame — a pair-count hash agg plus a single-row top-pair
cut — and the merge application is a narrow literal string replace.

Words are represented as each symbol wrapped in single spaces and
concatenated (`' a  b  c</w> '`): a merge of pair (a, b) is then the
literal replacement `' a  b ' -> ' ab '`, whose leftmost
non-overlapping semantics (identical in Spark's `replace`, DuckDB's
`replace`, and Python's `str.replace`) is EXACTLY BPE's greedy
left-to-right merge — `a a a a` merges to `aa aa`, never `a aa a` —
with the wrapping spaces preventing false sub-symbol matches. This
makes the whole trainer an ANSI-SQL-twinnable column program: no UDF,
no driver dict.

Scale notes: the iterated frame is the DISTINCT-WORD frame (Heaps' law:
~10^8 rows at 100 TB), never the corpus; pair counting is one
map-side-combinable hash agg per iteration; the top-pair cut is a
bounded 1-row collect (the merge table itself is the output and is
n_merges rows by construction); the words frame is localCheckpoint-ed
every ``checkpoint_every`` merges so plan depth stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _to_sym_string(term, eow: str = EOW):
    """term -> ' c  h  a  r  s</w> ' (each symbol space-wrapped)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        lambda i: term.substr(i, F.lit(1)),
    )
    syms = F.concat(chars, F.array(F.lit(eow)))
    return F.concat(F.lit(" "), F.array_join(syms, "  "), F.lit(" "))


def bpe_train(
    words: DataFrame,
    n_merges: int = 10,
    term_col: str = "term",
    count_col: str = "cnt",
    eow: str = EOW,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (term, count) frame.

    Returns a DataFrame (step, left_sym, right_sym, merged, cnt) — the
    merge table in learning order, built from ``n_merges`` bounded
    1-row collects (each iteration's argmax pair; ties broken by
    (count DESC, left ASC, right ASC) so the table is deterministic
    across engines and partitionings). Stops early if no adjacent pair
    remains.
    """
    spark = words.sparkSession
    cur = words.select(
        _to_sym_string(F.col(term_col), eow).alias("w"),
        F.col(count_col).cast("long").alias("cnt"),
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        if (step - 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
        syms = F.split(F.trim(F.col("w")), "  ")
        top = (
            cur.select(syms.alias("s"), "cnt")
            .filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("s"), 1, F.size("s") - 1),
                        F.slice(F.col("s"), 2, F.size("s") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: exactly one row
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((step, a, b, a + b, c))
        if step < n_merges:  # the last merge's application is never read
            cur = cur.withColumn(
                "w", F.replace(F.col("w"), F.lit(f" {a}  {b} "), F.lit(f" {a + b} "))
            )
    schema = "step int, left_sym string, right_sym string, merged string, cnt long"
    return spark.createDataFrame(merges, schema)


def bpe_segment(
    words: DataFrame,
    merges: list[tuple[str, str]],
    term_col: str = "term",
    eow: str = EOW,
    batch: int = 64,
) -> DataFrame:
    """Apply a learned merge list to a (term, ...) frame: adds a
    ``subwords`` array column — the BPE segmentation of each term under
    the merge table, applied in learning order (the standard encode
    path). Pure narrow column program: one literal replace per merge.

    Merges apply in ``batch``-sized chunks with a localCheckpoint
    between chunks: a real merge table is 30k+ entries, and a single
    nested expression that deep overflows Catalyst's converter stack
    (and ProjectCollapse would re-nest split projections), so the
    lineage must be truncated the same way bpe_train bounds its loop.
    ~500 chunk jobs for a 32k-merge table, each a narrow scan of the
    distinct-word frame — the price of the encode path staying UDF-free.
    """
    out = words.withColumn("__w", _to_sym_string(F.col(term_col), eow))
    for i in range(0, len(merges), batch):
        w = F.col("__w")
        for a, b in merges[i:i + batch]:
            w = F.replace(w, F.lit(f" {a}  {b} "), F.lit(f" {a + b} "))
        out = out.withColumn("__w", w)
        if i + batch < len(merges):
            out = out.localCheckpoint(eager=True)
    return out.withColumn("subwords", F.split(F.trim(F.col("__w")), "  ")).drop("__w")

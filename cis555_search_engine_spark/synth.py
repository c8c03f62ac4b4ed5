"""Deterministic synthetic transcript corpus (FIXTURES.md §1, §3).

Generates the input table of BASELINE.json's ``input_hint``::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string(null), ts:timestamp

Text is drawn from a Zipf(s=1.2) vocabulary of ~5,000 terms plus the
reference query terms (report p.5) planted at controlled frequencies, with
edge-case tokens (hyphenated, punctuation-wrapped, digit-only, mixed)
mixed in so tokenizer parity is actually exercised. Top Zipf terms appear
in >30% of turns — hot-term skew is real even at small scale.

Everything is a pure function of (seed, n_convs): no wall clock, no
global state — the Spark engine and the pure-Python oracle see identical
bytes.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "browser", None)

# Reference query set, report p.5 (SURVEY.md §5) — reused verbatim.
REFERENCE_QUERIES: list[str] = [
    "zoom", "skype", "noodle", "rice noodle", "wikipedia", "weather",
    "hurricane", "university", "donald trump", "white house", "joe biden",
    "bernie sanders", "presidential election", "street drug",
    "remdesivir gilead", "coronavirus", "delta airline", "warren buffett",
    "saudi arabia", "saudi aramco", "oil price",
]

_QUERY_TERMS: list[str] = sorted({t for q in REFERENCE_QUERIES for t in q.split()})

# Stem-sensitive variants so noodle/noodles etc. collapse under Porter.
_VARIANTS: list[str] = [
    "noodles", "elections", "hurricanes", "universities", "airlines",
    "weathered", "pricing", "priced", "drugs", "houses",
]

_EDGE_TOKENS: list[str] = [
    "rice-noodle", "--zoom!", "'noodle,", "12345", "covid-19", "6-7",
    "a", "--", "-a-", "zoom--", "o'clock", "don't",
]

_EPOCH = _dt.datetime(2020, 5, 1, 0, 0, 0)


def _base_vocab(n: int = 5000) -> list[str]:
    """Deterministic pseudo-word vocabulary: w000..w4999 spelled with letters."""
    letters = "abcdefghij"
    out = []
    for i in range(n):
        s = f"{i:04d}"
        out.append("w" + "".join(letters[int(c)] for c in s))
    return out


def generate_transcripts(
    n_convs: int = 500, seed: int = 42, length_skew: float = 0.0
) -> "pd.DataFrame":  # noqa: F821
    """Return a pandas DataFrame of the transcript corpus.

    ``length_skew > 0`` switches turn lengths from uniform(5, 60) to a
    heavy-tailed Pareto mix (shape ``1/length_skew``-ish): most turns
    stay short but a deterministic minority run to ~100x the median —
    the adversarial length profile for block-max pruning (uniform
    lengths give flat per-block score maxima, so WAND cannot skip
    anything no matter how it is implemented), sequence packing,
    repetition stats and passage dedup (round-4 verdict items 4+10).
    The default path draws the SAME rng stream as before, so existing
    seeds reproduce byte-identical fixtures.
    """
    import pandas as pd

    rng = np.random.default_rng(seed)
    vocab = np.array(_base_vocab())
    n_vocab = len(vocab)
    # Zipf-ish weights over vocabulary ranks.
    ranks = np.arange(1, n_vocab + 1, dtype=np.float64)
    zipf_p = ranks ** -1.2
    zipf_p /= zipf_p.sum()

    query_terms = np.array(_QUERY_TERMS + _VARIANTS)
    nq = len(query_terms)
    # Planted frequencies: some hot, some rare (rank-dependent).
    q_weights = np.array([0.5 ** (i % 8) for i in range(nq)])
    q_weights /= q_weights.sum()

    edge = np.array(_EDGE_TOKENS)

    rows: list[tuple] = []
    k_global = 0
    for ci in range(n_convs):
        conv_id = f"conv{ci:06d}"
        n_turns = int(rng.integers(1, 33))
        for ti in range(n_turns):
            n_tok = int(rng.integers(5, 60))
            if length_skew > 0:
                # Pareto heavy tail layered over the uniform draw (the
                # uniform draw is kept so the default rng stream is
                # untouched); cap keeps the worst doc bounded
                n_tok = 5 + min(
                    int(rng.pareto(max(0.5, 1.0 / length_skew)) * 20), 4000
                )
            toks = list(rng.choice(vocab, size=n_tok, p=zipf_p))
            # plant 0-4 query terms
            n_plant = int(rng.integers(0, 5))
            if n_plant:
                toks.extend(rng.choice(query_terms, size=n_plant, p=q_weights))
            # occasionally an edge-case token
            if rng.random() < 0.15:
                toks.append(str(rng.choice(edge)))
            rng.shuffle(toks)
            text = " ".join(toks)
            if rng.random() < 0.01:
                text = text + "  " + text.split(" ")[0]  # multi-space run
            role = ROLES[ti % 3]
            tool = TOOLS[int(rng.integers(0, 3))] if role == "tool" else None
            ts = _EPOCH + _dt.timedelta(seconds=37 * k_global)
            rows.append((conv_id, np.int32(ti), role, text, tool, ts))
            k_global += 1
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def transcripts_spark(spark, n_convs: int = 500, seed: int = 42, length_skew: float = 0.0):
    """Same corpus as a Spark DataFrame (Arrow createDataFrame path)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    return spark.createDataFrame(
        generate_transcripts(n_convs, seed, length_skew), schema=schema
    )

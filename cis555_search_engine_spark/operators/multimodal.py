"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
typed metadata struct. The Spark-side plumbing — schema, partitioning,
Arrow batch shape, `mapInPandas` signatures — is real and tested; the
actual media decode is STUBBED (`decode_media` raises
NotImplementedError; `fake_decode_meta` is the deterministic test
double), because no image/audio libraries exist in this container.

Batch-shape contract: `mapInPandas` receives Arrow batches as
`Iterator[pd.DataFrame]`; each output frame carries one row per input
payload. Per-batch (never per-row) Python, hashlib/len vectorized over
the batch — the same shape a real PIL/ffmpeg decode UDF would have.

Scale notes: payloads are large -> keep them out of shuffles. Metadata
extraction is a narrow map (no shuffle); downstream ops join on the
extracted metadata, projecting the binary column away (column pruning
keeps the parquet scan from reading payload bytes when only metadata is
needed).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("sha", T.StringType()),
        T.StructField("head_byte", T.IntegerType()),
    ]
)


def decode_media(payload: bytes, media_type: str):
    """Real media decode — NOT IMPLEMENTED in this container (no PIL /
    libav). The call site (`extract_meta(decoder=...)`) and batch shape
    are the real contract; swap this for the library call in prod."""
    raise NotImplementedError(
        f"media decode for {media_type!r} requires image/audio libraries "
        "not present in this environment"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, str, str, int]:
    """Deterministic stand-in for decode: (n_bytes, md5 hex, sha256 hex
    — the content-address key, reference: sha1(url) S3 keys,
    S3Wrapper.java:68 — and first byte)."""
    return (
        len(payload),
        hashlib.md5(payload).hexdigest(),
        hashlib.sha256(payload).hexdigest(),
        payload[0] if payload else -1,
    )


def with_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach a binary payload column (utf-8 bytes of the text — the test
    double for real media bytes) + media_type metadata."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def extract_meta(payloads: DataFrame, decoder=fake_decode_meta) -> DataFrame:
    """(id, payload) -> (id, n_bytes, digest, head_byte) via mapInPandas.

    `decoder` is called once per payload within an Arrow batch; the
    default is the deterministic fake (see module docstring).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            metas = [decoder(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "n_bytes": [m[0] for m in metas],
                    "digest": [m[1] for m in metas],
                    "sha": [m[2] for m in metas],
                    "head_byte": [m[3] for m in metas],
                }
            )

    return payloads.select("id", "payload").mapInPandas(gen, schema=META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    payloads: DataFrame, frame_size: int = 64, stride: int = 256
) -> DataFrame:
    """Frame-sampling plumbing: slice each payload into fixed-size chunks
    at a stride (the video-frame-sample analog; a real impl would call
    the decoder per keyframe). One-to-many mapInPandas — the UDTF shape.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                b = bytes(p)
                for k, off in enumerate(range(0, max(len(b), 1), stride)):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(b[off : off + frame_size])
            if ids:
                yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return payloads.select("id", "payload").mapInPandas(gen, schema=FRAME_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
typed metadata struct. The Spark-side plumbing — schema, partitioning,
Arrow batch shape, `mapInPandas` signatures — is real and tested, and so
is the IMAGE decode: `decode_media` parses PNG (IHDR + CRC check) and
JPEG (SOFn scan) containers byte-for-byte with no external libraries
(pluggable registry `IMAGE_DECODERS`). Audio/video feature extraction
still needs codec libraries absent from this container and raises
NotImplementedError behind the same dispatch contract.

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


# ---------------------------------------------------------- image codecs
#
# Real container parsing, no external libs: PNG and JPEG dimensions are
# fully specified by their public container formats (PNG: RFC 2083 IHDR;
# JPEG: ITU-T T.81 SOFn segments), so the decode step for image METADATA
# is implementable from bytes alone. Audio/video feature extraction still
# requires codec libraries absent from this container and stays behind
# NotImplementedError — but the dispatch contract below is the real one.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_png(width: int, height: int, idat: bytes = b"\x00" * 16) -> bytes:
    """Minimal VALID PNG container: signature + IHDR (with real CRC32) +
    one IDAT + IEND. Used as the deterministic test payload generator —
    the parser below does not special-case these bytes."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal VALID JPEG/JFIF header: SOI + APP0 + SOF0(h, w) + EOI."""
    import struct

    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x11\x00\x00"
    return soi + app0 + sof0 + b"\xff\xd9"


def parse_png_header(payload: bytes) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR, verifying signature and the
    IHDR CRC (a real parse, not a fixed-offset peek)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    (length,) = struct.unpack(">I", payload[8:12])
    typ = payload[12:16]
    if typ != b"IHDR" or length < 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    data = payload[16 : 16 + length]
    (crc,) = struct.unpack(">I", payload[16 + length : 20 + length])
    if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    width, height = struct.unpack(">II", data[:8])
    return int(width), int(height)


def parse_jpeg_header(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first SOFn segment of a JPEG marker
    stream (skips non-SOF segments by their declared lengths)."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"JPEG marker desync at {i}")
        marker = payload[i + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:  # no-length markers
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0..3
            height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
            return int(width), int(height)
        i += 2 + seglen
    raise ValueError("no SOF segment found")


IMAGE_DECODERS = {
    "image/png": parse_png_header,
    "image/jpeg": parse_jpeg_header,
}


def decode_media(payload: bytes, media_type: str) -> tuple[str, int, int]:
    """(format, width, height) for supported image containers — REAL
    byte-level parsing (IMAGE_DECODERS). Audio/video decode requires
    codec libraries not present in this container and raises; plug a
    decoder into IMAGE_DECODERS to extend (the dispatch, schema, and
    Arrow batch shape are the production contract)."""
    parser = IMAGE_DECODERS.get(media_type)
    if parser is None:
        raise NotImplementedError(
            f"media decode for {media_type!r} requires codec libraries "
            "not present in this environment"
        )
    w, h = parser(payload)
    return media_type.split("/", 1)[1], w, h


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


IMG_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def with_media_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL image container payload per doc (deterministic:
    even ids -> PNG, odd -> JPEG; dimensions derived from the id), via
    one Arrow-batched UDF. This is the synthetic stand-in for a corpus
    whose binary column holds actual media bytes — the decoder below
    parses the containers for real."""

    @F.pandas_udf(T.BinaryType())
    def _payload(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            w, h = int(i) % 300 + 1, int(i) % 200 + 1
            return make_png(w, h) if int(i) % 2 == 0 else make_jpeg(w, h)

        return ids.map(one)

    mt = F.when(F.col(id_col) % 2 == 0, F.lit("image/png")).otherwise(F.lit("image/jpeg"))
    return docs.select(
        F.col(id_col).alias("id"),
        _payload(F.col(id_col).cast("long")).alias("payload"),
        mt.alias("media_type"),
    )


def decode_image_meta(payloads: DataFrame) -> DataFrame:
    """(id, payload, media_type) -> (id, fmt, width, height, n_bytes)
    via mapInPandas — REAL container parsing (decode_media) per payload
    within an Arrow batch; the production shape for a PIL/ffmpeg decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            fmts, ws, hs, nb = [], [], [], []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                b = bytes(p)
                fmt, w, h = decode_media(b, str(mt))
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                nb.append(len(b))
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "fmt": fmts, "width": ws, "height": hs, "n_bytes": nb}
            )

    return payloads.select("id", "payload", "media_type").mapInPandas(gen, schema=IMG_META_SCHEMA)


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

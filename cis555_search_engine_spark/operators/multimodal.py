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


def make_wav(sample_rate: int, channels: int, n_samples: int) -> bytes:
    """Minimal VALID RIFF/WAVE container: fmt chunk (PCM s16le) + a
    zero-filled data chunk of ``n_samples`` frames."""
    import struct

    data = b"\x00" * (n_samples * channels * 2)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(payload: bytes) -> dict:
    """{sample_rate, channels, duration_ms} from a RIFF/WAVE stream —
    a real chunk walk (fmt + data located by their declared sizes), the
    same no-codec-needed byte parse as the PNG/JPEG decoders."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE")
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if size > len(payload) - (i + 8):
            # declared chunk size overruns the payload: for fmt/data
            # (the chunks we parse) or while either is still missing,
            # a truncated container must raise (the ValueError
            # rejection contract — never silently inflate duration
            # from a phantom data chunk). A truncated TRAILING
            # metadata chunk (LIST/INFO junk from sloppy taggers)
            # after fmt+data parsed cleanly is tolerated: stop walking.
            if cid in (b"fmt ", b"data") or fmt is None or data_size is None:
                raise ValueError(
                    f"WAV chunk {cid!r} size {size} overruns payload"
                )
            break
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", payload[i + 8 : i + 24])
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    _, channels, rate, _, block_align, bits = fmt
    bytes_per_s = rate * channels * (bits // 8)
    if bytes_per_s <= 0:
        raise ValueError("WAV fmt has zero rate")
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "duration_ms": int(data_size * 1000 // bytes_per_s),
    }


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(payload) + 8) + typ + payload


def make_mp4(width: int, height: int, duration_ms: int) -> bytes:
    """Minimal VALID MP4: ftyp + moov(mvhd timescale=1000 + trak(tkhd
    width/height as 16.16 fixed-point)) — ISO 14496-12 box layout."""
    import struct

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, 1000, duration_ms)  # v0, times, timescale, dur
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)      # volume 1.0
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),          # next track id
    )
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">B3xIIII", 0, 0, 0, 1, 0)   # v0/flags, times, track 1, rsvd
        + struct.pack(">I", duration_ms)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)       # layer, alt group, volume, rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
    return ftyp + moov


def _walk_mp4_boxes(payload: bytes, start: int, end: int):
    import struct

    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", payload[i : i + 4])
        typ = payload[i + 4 : i + 8]
        if size < 8 or i + size > end:
            raise ValueError(f"MP4 box desync at {i}")
        yield typ, i + 8, i + size
        i += size


def parse_mp4_header(payload: bytes) -> dict:
    """{width, height, duration_ms} from MP4 box headers (ftyp check,
    moov/mvhd timescale+duration, trak/tkhd 16.16 dimensions)."""
    import struct

    top = list(_walk_mp4_boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an MP4: first box is not ftyp")
    out: dict = {}
    for typ, s, e in top:
        if typ != b"moov":
            continue
        for t2, s2, e2 in _walk_mp4_boxes(payload, s, e):
            if t2 == b"mvhd":
                version = payload[s2]
                if version == 0:
                    timescale, duration = struct.unpack(">II", payload[s2 + 12 : s2 + 20])
                else:  # v1: 64-bit times
                    timescale, duration = struct.unpack(">IQ", payload[s2 + 20 : s2 + 32])
                out["duration_ms"] = int(duration * 1000 // timescale) if timescale else 0
            elif t2 == b"trak":
                for t3, s3, e3 in _walk_mp4_boxes(payload, s2, e2):
                    if t3 == b"tkhd":
                        w, h = struct.unpack(">II", payload[e3 - 8 : e3])
                        out["width"], out["height"] = w >> 16, h >> 16
    if "duration_ms" not in out or "width" not in out:
        raise ValueError("MP4 missing mvhd/tkhd")
    return out


def _image_fields(parser):
    def run(payload: bytes) -> dict:
        w, h = parser(payload)
        return {"width": w, "height": h}

    return run


# media_type -> bytes -> partial field dict (width/height/sample_rate/
# channels/duration_ms). Every entry is a REAL byte-level container
# parse; extend by registering more types. Codec-requiring work (pixel
# decode, PCM resample, frame extraction) is what still raises below.
MEDIA_DECODERS = {
    "image/png": _image_fields(parse_png_header),
    "image/jpeg": _image_fields(parse_jpeg_header),
    "audio/wav": parse_wav_header,
    "video/mp4": parse_mp4_header,
}

# Alias kept for the round-2 public name. NOTE the registry contract
# WIDENED in round 3: a registered decoder may return either a partial
# field dict (the current contract) or the round-2 (width, height)
# tuple — decode_media normalizes both, so decoders registered under
# the old image-only contract keep working.
IMAGE_DECODERS = MEDIA_DECODERS

_META_FIELDS = ("width", "height", "sample_rate", "channels", "duration_ms")


def decode_media(payload: bytes, media_type: str) -> dict:
    """{fmt, width, height, sample_rate, channels, duration_ms} (absent
    dimensions None) for supported containers — REAL byte-level parsing
    (MEDIA_DECODERS: PNG, JPEG, WAV/RIFF, MP4 boxes). Formats whose
    metadata cannot be byte-parsed without codec libraries raise; plug
    a decoder into MEDIA_DECODERS to extend (the dispatch, schema, and
    Arrow batch shape are the production contract). Decoders may return
    a partial field dict or the legacy (width, height) tuple."""
    parser = MEDIA_DECODERS.get(media_type)
    if parser is None:
        raise NotImplementedError(
            f"media decode for {media_type!r} requires codec libraries "
            "not present in this environment"
        )
    fields = parser(payload)
    if isinstance(fields, (tuple, list)):  # round-2 bytes->(w,h) contract
        if len(fields) != 2:
            raise ValueError(
                f"legacy decoder for {media_type!r} returned a "
                f"{len(fields)}-tuple; the (width, height) contract needs 2"
            )
        fields = {"width": fields[0], "height": fields[1]}
    out = {"fmt": media_type.split("/", 1)[1]}
    for k in _META_FIELDS:
        out[k] = fields.get(k)
    return out


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


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

# back-compat alias (round-2 public name; images carried only w/h)
IMG_META_SCHEMA = MEDIA_META_SCHEMA


def _synth_media(i: int) -> tuple[bytes, str]:
    """Deterministic synthetic media for doc id `i` (the test corpus has
    no binary column): id%4 cycles PNG / JPEG / WAV / MP4, every
    parameter pure id arithmetic so the SQL oracle can recompute the
    expected metadata without parsing anything."""
    w, h = i % 300 + 1, i % 200 + 1
    m = i % 4
    if m == 0:
        return make_png(w, h), "image/png"
    if m == 1:
        return make_jpeg(w, h), "image/jpeg"
    if m == 2:
        rate = 8000 + (i % 5) * 8000
        channels = (i // 4) % 2 + 1
        return make_wav(rate, channels, i % 100 + 1), "audio/wav"
    return make_mp4(w, h, i % 5000 + 500), "video/mp4"


def with_media_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL media container payload per doc (deterministic
    4-way PNG/JPEG/WAV/MP4 mix — `_synth_media`), via one Arrow-batched
    UDF. This is the synthetic stand-in for a corpus whose binary
    column holds actual media bytes — the decoder below parses the
    containers for real."""

    @F.pandas_udf(T.BinaryType())
    def _payload(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: _synth_media(int(i))[0])

    # pmod, NOT %: Spark's % is sign-preserving while _synth_media uses
    # Python's non-negative % — a negative doc id would otherwise get a
    # payload whose container contradicts its declared media_type (and
    # the decoder would raise on the mismatch)
    m4 = F.pmod(F.col(id_col), F.lit(4))
    mt = (
        F.when(m4 == 0, F.lit("image/png"))
        .when(m4 == 1, F.lit("image/jpeg"))
        .when(m4 == 2, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        _payload(F.col(id_col).cast("long")).alias("payload"),
        mt.alias("media_type"),
    )


def decode_media_meta(payloads: DataFrame) -> DataFrame:
    """(id, payload, media_type) -> (id, fmt, width, height,
    sample_rate, channels, duration_ms, n_bytes) via mapInPandas — REAL
    container parsing (decode_media) per payload within an Arrow batch;
    the production shape for a PIL/ffmpeg decode. Fields a format does
    not carry are NULL (images have no sample_rate; WAV no width)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cols: dict[str, list] = {
                k: [] for k in ("fmt", *_META_FIELDS)
            }
            nb = []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                b = bytes(p)
                meta = decode_media(b, str(mt))
                for k in cols:
                    cols[k].append(meta[k])
                nb.append(len(b))
            out = {"id": pdf["id"].to_numpy(), **cols, "n_bytes": nb}
            yield pd.DataFrame(out)

    return payloads.select("id", "payload", "media_type").mapInPandas(
        gen, schema=MEDIA_META_SCHEMA
    )


# back-compat alias (round-2 public name)
decode_image_meta = decode_media_meta


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

"""Delta + varint codec for posting blocks (pure functions, numpy-backed).

Layout of one posting-block blob (all ints LEB128 varint, little-endian
7-bit groups, high bit = continuation):

    n                     -- number of postings (docs) in the block
    docid_delta[n]        -- docid[0] - block_base, then docid[i]-docid[i-1]
    tf[n]
    doc_len[n]            -- per-doc token count (kills the query-time join
                             against doc_stats: a decoded block is
                             self-sufficient for exact BM25)
    npos[n]               -- number of positions per posting (0 allowed)
    pos_delta[sum(npos)]  -- per posting: pos[0], then pos[j]-pos[j-1]

The reference stores one MySQL row per (word, urlid) with no positions and
no compression (`invertedIndexStemmed`, report p.2; SURVEY.md §1.1) — this
codec is the north-star upgrade: postings become delta-encoded
varint-compressed blobs, grouped in doc-range-aligned blocks.

These functions only ever run inside Arrow-batched pandas UDFs
(`applyInPandas`/`mapInPandas`) on whole blocks — never per row.
"""

from __future__ import annotations

import numpy as np


def encode_varints(values: "np.ndarray | list[int]") -> bytes:
    """LEB128-encode a sequence of non-negative ints."""
    out = bytearray()
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError(f"varint requires non-negative ints, got {v}")
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def decode_varints(buf: bytes, offset: int = 0, count: int | None = None):
    """Decode `count` varints (or all, if None) from buf[offset:].

    Returns (numpy int64 array, next_offset).
    """
    vals: list[int] = []
    i = offset
    n = len(buf)
    while i < n and (count is None or len(vals) < count):
        shift = 0
        cur = 0
        while True:
            b = buf[i]
            i += 1
            cur |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        vals.append(cur)
    if count is not None and len(vals) != count:
        raise ValueError(f"expected {count} varints, got {len(vals)}")
    return np.asarray(vals, dtype=np.int64), i


def encode_block(
    docids: "np.ndarray",
    tfs: "np.ndarray",
    doc_lens: "np.ndarray",
    positions: "list[list[int]]",
    block_base: int,
) -> bytes:
    """Encode one posting block. `docids` must be sorted ascending and
    >= block_base; positions[i] sorted ascending for posting i."""
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doc_lens = np.asarray(doc_lens, dtype=np.int64)
    n = len(docids)
    if n == 0:
        return encode_varints([0])
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = docids[0] - block_base
    if n > 1:
        deltas[1:] = np.diff(docids)
    if deltas.min() < 0:
        raise ValueError("docids not sorted / below block_base")
    npos = [len(p) for p in positions]
    pos_deltas: list[int] = []
    for p in positions:
        prev = 0
        first = True
        for x in p:
            pos_deltas.append(x if first else x - prev)
            prev = x
            first = False
    parts = [
        encode_varints([n]),
        encode_varints(deltas),
        encode_varints(tfs),
        encode_varints(doc_lens),
        encode_varints(npos),
        encode_varints(pos_deltas),
    ]
    return b"".join(parts)


def decode_block(blob: bytes, block_base: int):
    """Inverse of encode_block -> (docids, tfs, doc_lens, positions)."""
    (n_arr, off) = decode_varints(blob, 0, 1)
    n = int(n_arr[0])
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty.copy(), empty.copy(), []
    deltas, off = decode_varints(blob, off, n)
    docids = np.cumsum(deltas) + block_base
    tfs, off = decode_varints(blob, off, n)
    doc_lens, off = decode_varints(blob, off, n)
    npos, off = decode_varints(blob, off, n)
    total_pos = int(npos.sum())
    pos_deltas, off = decode_varints(blob, off, total_pos)
    positions: list[list[int]] = []
    j = 0
    for c in npos:
        c = int(c)
        chunk = pos_deltas[j : j + c]
        positions.append(np.cumsum(chunk).tolist() if c else [])
        j += c
    return docids, tfs, doc_lens, positions

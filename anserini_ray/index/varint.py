"""Vectorized LEB128 varint + delta-gap codec for posting lists.

Reference semantics: Lucene posting lists store doc-id deltas + term freqs in
a compressed byte stream (the reference's index is built by Lucene's
IndexWriter, `J/index/IndexCollection.java:737-787`); we re-express the same
idea as numpy-vectorized LEB128 over Arrow-held buffers so encode/decode are
kernel-speed, not Python-loop-speed.

Encoding: little-endian base-128; low 7 bits per byte; MSB set means
"continuation" (more bytes follow). Values must be uint64 < 2**35 here
(5 bytes max covers doc gaps and tfs comfortably).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 5


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte counts (for block-offset computation)."""
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    return nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to an LEB128 byte stream."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = varint_sizes(v)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    rem = v.copy()
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        idx = starts[mask] + k
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        rem[mask] >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes | memoryview | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode an LEB128 byte stream to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    n = ends.size
    vals = np.zeros(n, dtype=np.uint64)
    maxlen = int(lengths.max())
    for k in range(maxlen):
        mask = lengths > k
        vals[mask] |= (b[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    if count is not None and n != count:
        raise ValueError(f"varint stream held {n} values, expected {count}")
    return vals


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing ints -> first value + gaps (first kept absolute)."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_postings(doc_ords: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted local doc ordinals, tfs) -> (doc gap stream, tf stream)."""
    return varint_encode(delta_encode(doc_ords)), varint_encode(tfs)


def decode_postings(doc_blob, tf_blob, count: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    ords = delta_decode(varint_decode(doc_blob, count))
    tfs = varint_decode(tf_blob, count)
    return ords, tfs

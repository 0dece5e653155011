"""Lucene SmallFloat byte4 norm quantization (doc-length encoding).

Stock Lucene `BM25Similarity` does not see exact doc lengths at query time:
`computeNorm` stores `SmallFloat.intToByte4(numTerms)` — a lossy monotone
1-byte encoding — and scoring decodes it through a 256-entry LENGTH_TABLE.
The reference keeps that default (its `-bm25.accurate` flag +
`AccurateBM25Similarity.java:57-65` exists precisely to bypass it, storing
the exact token count). We implement both:

- mode "lucene"   — quantize doc length through byte4 (regression parity);
- mode "accurate" — exact integer doc length (`-bm25.accurate` parity).

byte4 format (Lucene `SmallFloat.longToInt4` / `int4ToLong`): values with
fewer than 4 significant bits are stored exactly ("subnormal"); otherwise the
top 3 bits below the implicit leading 1 are kept as mantissa and the shift is
stored (+1) in the upper bits. `intToByte4` then remaps so the first
NUM_FREE_VALUES small integers are exact. Quantization rounds DOWN
(truncation), so quantized(dl) <= dl and the mapping is monotone — which is
what makes block-max bounds computed on raw min-dl safe after quantization.
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only non-negative")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading 1
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(i: int) -> int:
    """Lucene SmallFloat.intToByte4 (returned as unsigned 0..255)."""
    if i < 0:
        raise ValueError("only non-negative")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Lucene SmallFloat.byte4ToInt (b unsigned 0..255)."""
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


# LENGTH_TABLE exactly as BM25Similarity builds it.
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.float32)

# Monotone decode-of-encode lookup for dl values, precomputed for the common
# small range; larger values fall back to the scalar path.
_QUANT_CACHE_SIZE = 1 << 16
_QUANT_CACHE = np.array(
    [byte4_to_int(int_to_byte4(i)) for i in range(_QUANT_CACHE_SIZE)],
    dtype=np.int64,
)


def quantize_lengths(dl: np.ndarray) -> np.ndarray:
    """Vectorized byte4 round-trip: what stock Lucene BM25 'sees' as dl.

    Clip-then-take instead of boolean-mask split: the mask path costs three
    full boolean-indexing passes (measured 1.2-2.3 s on a 16.7M-doc segment
    open vs 0.06 s for a straight table take); >=2^16 lengths are rare, so
    they are fixed up individually afterwards."""
    dl = np.asarray(dl, dtype=np.int64)
    out = _QUANT_CACHE[np.minimum(dl, _QUANT_CACHE_SIZE - 1)]
    if dl.size and int(dl.max()) >= _QUANT_CACHE_SIZE:
        for i in np.flatnonzero(dl >= _QUANT_CACHE_SIZE):
            out[i] = byte4_to_int(int_to_byte4(int(dl[i])))
    return out


def encode_norm_bytes(dl: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over doc lengths -> uint8 norm bytes."""
    dl = np.asarray(dl, dtype=np.int64)
    out = np.empty(dl.shape, dtype=np.uint8)
    for i, v in enumerate(dl.tolist()):
        out[i] = int_to_byte4(v)
    return out

"""Baseline JPEG codec (ITU-T T.81 sequential DCT) in stdlib + numpy.

Shrinks the multimodal stub surface: real-world image corpora are mostly
JPEG, and baseline JPEG needs no external library — the entropy coder is
plain Huffman (Annex F), the transform an 8x8 DCT, both expressible with
ints and numpy. Scope:

- decode: baseline sequential (SOF0), 8-bit, grayscale or YCbCr with any
  standard sampling (4:4:4 / 4:2:2 / 4:2:0 / ...), multiple DQT/DHT
  segments, restart intervals (DRI + RSTn), byte stuffing. Progressive
  (SOF2), arithmetic coding and 12-bit precision raise NotImplementedError.
- encode: baseline 4:4:4 (or single-component grayscale) with the Annex
  K.1 quantization tables scaled by an IJG-style quality factor and the
  Annex K.3 typical Huffman tables — enough to generate valid bitstreams
  for round-trip testing and synthetic corpora.

The Huffman bit loops are per-symbol Python (inherent to the format); the
numeric heavy lifting — DCT/IDCT over all blocks at once, quantization,
color transforms, upsampling — is vectorized numpy. In the pipeline this
runs inside the multimodal actor pool (`MediaFeatureExtract`), whose
batch sizing already assumes decode-bound payloads.

Reference for WHAT to compute: the reference engine has no media path
(multimodal ops come from the LLM-pipeline brief); the format itself is
the public T.81 spec.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 example quantization tables (natural / raster order)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: forward F = C @ B @ C.T, inverse
    B = C.T @ F @ C."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


_DCT = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]):
    """Annex C code assignment: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]):
    """(length, code) -> symbol, for the bit-serial decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = the Annex tables, 100 = near-lossless."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad(self):
        if self.nbits:
            p = 8 - self.nbits
            self.write((1 << p) - 1, p)  # pad with 1s per spec

    def marker(self, m: int):
        """Emit a raw marker (not byte-stuffed) at a byte boundary."""
        self.pad()
        self.buf += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category/size, amplitude bits) for a DC diff or AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(writer: _BitWriter, blk: np.ndarray,
                  dc_codes: dict, ac_codes: dict, pred: int) -> int:
    """Huffman-encode one zigzagged quantized block (64,); returns the new
    DC predictor."""
    diff = int(blk[0]) - pred
    pred = int(blk[0])
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    writer.write(bits, size)
    run = 0
    nz = np.flatnonzero(blk[1:])
    last = nz[-1] + 1 if nz.size else 0
    for i in range(1, last + 1):
        v = int(blk[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return pred


def _component_coeffs(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Level-shift, 8x8 DCT, quantize, zigzag. plane is (H8, W8) float64
    with H8, W8 multiples of 8. Returns (nblocks, 64) int — blocks in
    raster order."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    ) - 128.0
    f = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    q = np.round(f / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    if h < ph or w < pw:
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return plane


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 block-average chroma downsample (odd dims edge-padded first)."""
    p = _pad_to(plane, -(-plane.shape[0] // 2) * 2, -(-plane.shape[1] // 2) * 2)
    return (
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode: (H, W) grayscale or (H, W, 3) RGB uint8.
    subsampling "444" or "420" (ignored for grayscale); restart_interval
    emits RSTn markers every N MCUs (0 = none). Standard Annex-K tables
    scaled by the IJG-style `quality` factor."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (H, W) or (H, W, 3)")
    qt_l = _quality_scale(QT_LUM, quality)
    qt_c = _quality_scale(QT_CHROM, quality)

    if gray:
        planes = [img.astype(np.float64)]
        sampling = [(1, 1)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "444":
            planes = [y, cb, cr]
            sampling = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            planes = [y, _downsample2(cb), _downsample2(cr)]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # coeffs[k]: (blocks_y, blocks_x, 64) zigzagged quantized blocks
    coeffs = []
    for k, ((sh, sv), p) in enumerate(zip(sampling, planes)):
        by, bx = mcuy * sv, mcux * sh
        padded = _pad_to(p, by * 8, bx * 8)
        c = _component_coeffs(padded, qt_l if k == 0 else qt_c)
        coeffs.append(c.reshape(by, bx, 64))

    dc_l = _huff_codes(*DC_LUM)
    ac_l = _huff_codes(*AC_LUM)
    dc_c = _huff_codes(*DC_CHROM)
    ac_c = _huff_codes(*AC_CHROM)
    tables = [
        (dc_l, ac_l) if k == 0 else (dc_c, ac_c)
        for k in range(len(planes))
    ]

    writer = _BitWriter()
    preds = [0] * len(planes)
    nmcu = mcux * mcuy
    rst = 0
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            writer.marker(0xD0 + rst)
            rst = (rst + 1) % 8
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for k, (sh, sv) in enumerate(sampling):
            dc, ac = tables[k]
            for v in range(sv):
                for hh in range(sh):
                    preds[k] = _encode_block(
                        writer, coeffs[k][my * sv + v, mx * sh + hh],
                        dc, ac, preds[k],
                    )
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )  # APP0

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(v) for v in table[ZIGZAG]
        )

    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)

    ncomp = len(planes)
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(sampling):
        sof += struct.pack(
            "BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1
        )
    out += b"\xff\xc0" + sof  # SOF0

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, *DC_LUM) + dht(1, 0, *AC_LUM)
    if not gray:
        out += dht(0, 1, *DC_CHROM) + dht(1, 1, *AC_CHROM)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        sos += struct.pack("BB", ci + 1, 0 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos + scan + b"\xff\xd9"  # SOS .. EOI
    return bytes(out)


# ----------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= self.bits.size:
            raise ValueError("truncated JPEG entropy stream")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bits.size:
            raise ValueError("truncated JPEG entropy stream")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def read_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _destuff(scan: bytes):
    """Split the entropy-coded scan at RSTn markers and remove byte
    stuffing. Returns (intervals, bytes consumed including any trailing
    marker that ends the scan)."""
    intervals = []
    cur = bytearray()
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = scan[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker: scan ends
            break
    intervals.append(bytes(cur))
    return intervals, i


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG. Returns (H, W) uint8 for
    single-component images, else (H, W, 3) uint8 RGB (JFIF YCbCr)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    i = 2
    n = len(buf)
    while i < n:
        if buf[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        marker = buf[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if i + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", buf, i)
        if i + seglen > n:
            raise ValueError("truncated JPEG segment")
        seg = buf[i + 2 : i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    t = np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                    j += 64
                else:
                    t = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    )
                    j += 128
                qts[tq] = t.astype(np.int64)[UNZIGZAG]
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                cnt = sum(bits)
                if len(bits) < 16 or j + 17 + cnt > len(seg):
                    raise ValueError("truncated DHT segment")
                vals = list(seg[j + 17 : j + 17 + cnt])
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                j += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(only baseline sequential is implemented)"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scomp.append((cs, tables >> 4, tables & 0x0F))
            intervals, used = _destuff(buf[i:])
            i += used
            img = _decode_scan(frame, scomp, qts, huff, intervals, restart)
            return img
        # else: APPn/COM/etc — skipped
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scomp, qts, huff, intervals, restart):
    fh, fw = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_id = {c["id"]: k for k, c in enumerate(comps)}
    order = [by_id[cs] for cs, _, _ in scomp]
    dc_t = {by_id[cs]: huff[(0, td)] for cs, td, _ in scomp}
    ac_t = {by_id[cs]: huff[(1, ta)] for cs, _, ta in scomp}

    # coefficient storage: (blocks_y, blocks_x, 64) per component
    store = []
    for c in comps:
        store.append(
            np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        )

    nmcu = mcux * mcuy
    per_interval = restart if restart else nmcu
    mcu = 0
    for interval in intervals:
        if mcu >= nmcu:
            break
        reader = _BitReader(interval)
        preds = [0] * len(comps)
        end = min(mcu + per_interval, nmcu)
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for k in order:
                c = comps[k]
                for v in range(c["v"]):
                    for hgrid in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = reader.read_huff(dc_t[k])
                        diff = _extend(reader.read_bits(s), s)
                        preds[k] += diff
                        blk[0] = preds[k]
                        idx = 1
                        while idx < 64:
                            rs = reader.read_huff(ac_t[k])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    idx += 16
                                    continue
                                break  # EOB
                            idx += r
                            if idx > 63:
                                raise ValueError("AC index overflow")
                            blk[idx] = _extend(reader.read_bits(s), s)
                            idx += 1
                        store[k][my * c["v"] + v, mx * c["h"] + hgrid] = blk
            mcu += 1
    if mcu < nmcu:
        raise ValueError("truncated JPEG scan (missing MCUs)")

    planes = []
    for k, c in enumerate(comps):
        qt = qts[c["tq"]].astype(np.float64)
        coeff = store[k].reshape(-1, 64)[:, UNZIGZAG].astype(np.float64)
        coeff *= qt
        blocks = coeff.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        by, bx = store[k].shape[:2]
        plane = (
            pix.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # component dims, then nearest upsample to full MCU-padded grid
        ch = -(-fh * c["v"] // vmax)
        cw = -(-fw * c["h"] // hmax)
        plane = plane[:ch, :cw]
        if c["v"] != vmax or c["h"] != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0),
                hmax // c["h"], axis=1,
            )
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

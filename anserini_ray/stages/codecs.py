"""Pure-numpy media codecs — REAL decode paths for the multimodal stages.

No imaging/audio libraries exist in this environment, but several media
formats are simple enough to decode with `struct` + numpy alone, which
turns the multimodal stages' decode step from a declared stub into real
code for:

- PPM (P6 binary RGB) and PGM (P5 binary gray) images — encode + decode
- BMP (uncompressed 24-bit BI_RGB, bottom-up) images — decode
- WAV (RIFF PCM, 8/16-bit, mono or interleaved multichannel) — encode +
  decode

- PNG (8-bit gray / gray+alpha / RGB / RGBA / palette, non-interlaced) —
  encode + decode: zlib (stdlib) inflate + all five scanline filters
  (None/Sub/Up/Average/Paeth) unfiltered in numpy

plus numpy resampling kernels (nearest / bilinear image resize, audio
window framing). JPEG (encode + decode; baseline and progressive, incl.
4:2:0 and restart intervals) lives in the sibling `stages/jpeg.py`.
Formats outside this set still raise NotImplementedError in the stages
(documented); MP3 / MP4 remain library-bound and out of scope.
"""

from __future__ import annotations

import functools
import struct
import zlib

import numpy as np

# corrupt-input allocation guard shared by the image decoders: a flipped
# dimension field must produce ValueError, not a multi-GB allocation
MAX_PIXELS = 1 << 28


def _decode_guard(fn):
    """Corrupt payloads are routine at corpus scale: decoders must fail
    with ValueError (or NotImplementedError for declared-unsupported
    features), never leak struct.error / zlib.error / IndexError — an
    unexpected exception type kills the decoding actor's batch."""

    @functools.wraps(fn)
    def wrapped(buf, *a, **k):
        try:
            return fn(buf, *a, **k)
        except (ValueError, NotImplementedError):
            raise
        except (struct.error, zlib.error, IndexError, KeyError,
                OverflowError, TypeError) as e:
            raise ValueError(
                f"corrupt payload in {fn.__name__} ({type(e).__name__})"
            ) from e

    return wrapped


# ------------------------------------------------------------------ PPM/PGM


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM; (h, w) uint8 -> P5 PGM."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        header = f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    elif img.ndim == 2:
        header = f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    else:
        raise ValueError("expected (h, w, 3) RGB or (h, w) gray uint8")
    return header + img.tobytes()


def _ppm_header(buf: bytes):
    """Parse the P5/P6 header (with comment lines) -> (magic, w, h, offset)."""
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    magic = buf[:2].decode()
    fields = []
    i = 2
    while len(fields) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":  # comment to end of line
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        fields.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM/PGM supported")
    return magic, w, h, i


@_decode_guard
def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary P6 -> (h, w, 3) uint8; P5 -> (h, w) uint8."""
    magic, w, h, off = _ppm_header(buf)
    ch = 3 if magic == "P6" else 1
    arr = np.frombuffer(buf, dtype=np.uint8, count=w * h * ch, offset=off)
    return arr.reshape((h, w, 3) if ch == 3 else (h, w)).copy()


# --------------------------------------------------------------------- BMP


@_decode_guard
def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB.

    Handles the standard bottom-up row order and 4-byte row padding;
    top-down (negative height) files too."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB supported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError("invalid BMP dimensions")
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for r in range(h):
        src = data_off + r * row_bytes
        row = np.frombuffer(buf, dtype=np.uint8, count=w * 3, offset=src)
        dst = r if top_down else h - 1 - r
        out[dst] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = []
    pad = b"\x00" * (row_bytes - w * 3)
    for r in range(h - 1, -1, -1):
        rows.append(img[r, :, ::-1].tobytes() + pad)
    return header + b"".join(rows)


# --------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int16 inputs (left, up, up-left)."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. raw is (h, 1 + stride) uint8 (filter
    byte + filtered scanline). Sub/Up are fully vectorized; Average/Paeth
    have an unavoidable left-pixel data dependence, walked per pixel COLUMN
    (w steps, each a vector over the bpp lanes) only on rows that use them."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = int(raw[r, 0])
        line = raw[r, 1:].copy()
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: per-lane prefix sum mod 256
            rec = line
            for lane in range(bpp):
                np.add.accumulate(
                    rec[lane::bpp], dtype=np.uint8, out=rec[lane::bpp]
                )
        elif ftype == 2:  # Up
            rec = line + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            rec = line
            up = prev.astype(np.int16)
            rec[:bpp] += (up[:bpp] >> 1).astype(np.uint8)
            for x in range(bpp, stride, bpp):
                left = rec[x - bpp: x].astype(np.int16)
                rec[x: x + bpp] += (
                    (left + up[x: x + bpp]) >> 1
                ).astype(np.uint8)
        elif ftype == 4:  # Paeth
            rec = line
            up = prev.astype(np.int16)
            rec[:bpp] += up[:bpp].astype(np.uint8)  # a=c=0 -> predictor = b
            for x in range(bpp, stride, bpp):
                a = rec[x - bpp: x].astype(np.int16)
                b = up[x: x + bpp]
                c = up[x - bpp: x]
                rec[x: x + bpp] += _paeth_predict(a, b, c).astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = rec
        prev = rec
    return out


@_decode_guard
def decode_png(buf: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> uint8 array: (h, w) gray, (h, w, 2)
    gray+alpha, (h, w, 3) RGB (palette expands to this), or (h, w, 4) RGBA.
    Pure stdlib zlib + numpy; raises on 16-bit, <8-bit, or Adam7 files."""
    if buf[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = len(_PNG_SIG)
    w = h = None
    depth = ctype = interlace = None
    palette = None
    trns = None
    idat = []
    while i + 8 <= len(buf):
        size, cid = struct.unpack_from(">I4s", buf, i)
        body = buf[i + 8: i + 8 + size]
        if cid == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif cid == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        i += 12 + size  # length + id + crc
    if w is None:
        raise ValueError("missing IHDR")
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth={depth})")
    if interlace:
        raise ValueError("Adam7 interlaced PNG not supported")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    data = zlib.decompress(b"".join(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
    px = _unfilter(raw, h, stride, ch)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        idx = px.reshape(h, w)
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    img = px.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(img: np.ndarray, *, level: int = 6) -> bytes:
    """uint8 (h, w) gray / (h, w, 2) gray+alpha / (h, w, 3) RGB /
    (h, w, 4) RGBA -> PNG bytes (filter 0 scanlines, stdlib zlib)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (1, 2, 3, 4):
        ch = img.shape[2]
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        flat = img
    else:
        raise ValueError("expected (h, w[, {1,2,3,4}]) uint8")
    h, w = flat.shape[:2]
    scan = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    scan[:, 1:] = flat.reshape(h, w * ch)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), level)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ resize


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys][:, xs]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resample (align_corners=False convention)."""
    h, w = img.shape[:2]
    img_f = img.astype(np.float32)
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(y - y0, 0, 1)[:, None]
    wx = np.clip(x - x0, 0, 1)[None, :]
    if img.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    top = img_f[y0][:, x0] * (1 - wx) + img_f[y0][:, x1] * wx
    bot = img_f[y1][:, x0] * (1 - wx) + img_f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 (n,) or (n, ch) samples -> RIFF PCM WAV bytes."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    ch = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate,
            ch * 2, 16,
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


@_decode_guard
def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV -> (samples float32 in [-1, 1] shaped (n,) or (n, ch),
    sample_rate). Walks chunks, so extra chunks (LIST etc.) are fine."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, i)
        body = buf[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, sr, _br, _ba, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError("only 8/16-bit PCM supported")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if ch > 1:
        s = s[: (len(s) // ch) * ch].reshape(-1, ch)
    return s, sr


def frame_windows(samples: np.ndarray, sample_rate: int,
                  window_s: float, hop_s: float) -> np.ndarray:
    """(n,) mono samples -> (n_windows, win_len) frames (tail dropped)."""
    win = max(1, int(round(window_s * sample_rate)))
    hop = max(1, int(round(hop_s * sample_rate)))
    if samples.ndim > 1:
        samples = samples.mean(axis=1)
    n = (len(samples) - win) // hop + 1 if len(samples) >= win else 0
    if n <= 0:
        return np.empty((0, win), dtype=np.float32)
    idx = np.arange(win)[None, :] + (np.arange(n) * hop)[:, None]
    return samples[idx].astype(np.float32)

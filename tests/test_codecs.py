"""Pure-numpy media codecs + the REAL (decoder='numpy') multimodal paths."""

import json
import struct

import pytest

import numpy as np
import pyarrow as pa

from anserini_ray.stages.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    frame_windows,
    resize_bilinear,
    resize_nearest,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_round_trip_and_layout():
    img = _img(7, 5)
    buf = encode_ppm(img)
    assert buf.startswith(b"P6\n5 7\n255\n")
    assert len(buf) == len(b"P6\n5 7\n255\n") + 7 * 5 * 3
    assert np.array_equal(decode_ppm(buf), img)
    # PGM gray + comments in the header
    gray = img[:, :, 0]
    gbuf = encode_ppm(gray)
    assert np.array_equal(decode_ppm(gbuf), gray)
    commented = b"P6\n# a comment\n5 7\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(commented), img)


def test_bmp_round_trip_and_independent_layout():
    img = _img(5, 3, seed=1)  # w=3 -> 9 bytes/row -> 3 pad bytes
    buf = encode_bmp(img)
    assert buf[:2] == b"BM"
    # independent header checks
    assert struct.unpack_from("<I", buf, 10)[0] == 54  # pixel data offset
    w, h = struct.unpack_from("<ii", buf, 18)
    assert (w, h) == (3, 5)
    assert struct.unpack_from("<H", buf, 28)[0] == 24  # bpp
    # bottom row of the file is the TOP image row, BGR order, padded to 12
    row = buf[54 : 54 + 12]
    assert row[:3] == bytes(img[4, 0, ::-1])
    assert np.array_equal(decode_bmp(buf), img)


def test_resize_kernels():
    img = _img(8, 8, seed=2)
    up = resize_bilinear(img, 16, 16)
    assert up.shape == (16, 16, 3)
    down = resize_bilinear(img, 4, 4)
    assert down.shape == (4, 4, 3)
    # constant image stays constant under both kernels
    const = np.full((6, 6, 3), 37, dtype=np.uint8)
    assert np.array_equal(resize_bilinear(const, 9, 5), np.full((9, 5, 3), 37))
    assert np.array_equal(resize_nearest(const, 3, 7), np.full((3, 7, 3), 37))
    # nearest on identity size is identity
    assert np.array_equal(resize_nearest(img, 8, 8), img)


def test_wav_round_trip_and_chunk_walk():
    t = np.arange(1600)
    sig = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16)
    buf = encode_wav(sig, 16000)
    out, sr = decode_wav(buf)
    assert sr == 16000
    assert np.allclose(out, sig / 32768.0, atol=1e-6)
    # an extra chunk between fmt and data must be skipped
    pre, data = buf[:36], buf[36:]
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    out2, sr2 = decode_wav(pre[:12] + pre[12:36] + extra + data)
    assert sr2 == 16000 and np.allclose(out2, out)
    # stereo
    st = np.stack([sig, -sig], axis=1)
    sout, _ = decode_wav(encode_wav(st, 8000))
    assert sout.shape == (1600, 2)


def test_frame_windows():
    samples = np.arange(10, dtype=np.float32)
    f = frame_windows(samples, sample_rate=2, window_s=2.0, hop_s=1.0)
    # win=4, hop=2 -> windows [0..3], [2..5], [4..7], [6..9]
    assert f.shape == (4, 4)
    assert np.array_equal(f[0], [0, 1, 2, 3])
    assert np.array_equal(f[-1], [6, 7, 8, 9])


def test_image_resize_stage_real_numpy(ray_session):
    import ray.data

    from anserini_ray.stages.multimodal import ImageResize

    img = _img(10, 6, seed=3)
    tbl = pa.table(
        {
            "item_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array(
                [encode_ppm(img), encode_bmp(img)], type=pa.large_binary()
            ),
            "media_type": ["image/x-portable-pixmap", "image/bmp"],
            "meta": [json.dumps({"w": 6, "h": 10})] * 2,
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            ImageResize,
            fn_constructor_kwargs={
                "target_w": 4, "target_h": 8, "decoder": "numpy"
            },
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    assert len(out) == 2
    want = resize_bilinear(img, 8, 4)
    got_ppm = decode_ppm(out[0]["payload"])
    got_bmp = decode_bmp(out[1]["payload"])
    assert np.array_equal(got_ppm, want)
    assert np.array_equal(got_bmp, want)
    assert json.loads(out[0]["meta"]) == {"w": 4, "h": 8}


def test_audio_window_stage_real_numpy(ray_session):
    import ray.data

    from anserini_ray.stages.multimodal import AudioWindow

    sig = (np.sin(np.linspace(0, 40, 32000)) * 10000).astype(np.int16)
    tbl = pa.table(
        {
            "item_id": pa.array([7], type=pa.int64()),
            "payload": pa.array([encode_wav(sig, 16000)], type=pa.large_binary()),
            "media_type": ["audio/wav"],
            "meta": [json.dumps({"sr": 16000, "seconds": 2})],
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            AudioWindow,
            fn_constructor_kwargs={
                "window_s": 1.0, "hop_s": 0.5, "decoder": "numpy"
            },
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    # 2 s at win 1 s hop 0.5 s -> 3 windows
    assert [r["window_idx"] for r in out] == [0, 1, 2]
    assert [r["start_s"] for r in out] == [0.0, 0.5, 1.0]
    w0, sr = decode_wav(out[0]["payload"])
    assert sr == 16000 and len(w0) == 16000
    assert np.allclose(w0, sig[:16000] / 32768.0, atol=2e-4)


def test_media_features_real_numpy(ray_session):
    import ray.data

    from anserini_ray.stages.multimodal import media_pipeline

    img = _img(16, 16, seed=4)
    sig = (np.sin(np.linspace(0, 20, 8000)) * 15000).astype(np.int16)
    tbl = pa.table(
        {
            "item_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array(
                [encode_ppm(img), encode_wav(sig, 8000)],
                type=pa.large_binary(),
            ),
            "media_type": ["image/x-portable-pixmap", "audio/wav"],
            "meta": ["{}", "{}"],
        }
    )
    out = media_pipeline(
        ray.data.from_arrow(tbl), decoder="numpy"
    ).take_all()
    feats = {r["item_id"]: np.asarray(r["features"]) for r in out}
    # image: normalized luminance histogram
    assert abs(feats[1].sum() - 1.0) < 1e-5
    # audio: RMS envelope of a sine — bounded, mostly near the expected
    # RMS (amp/sqrt(2) = 15000/32768/1.414 ~ 0.32); the first segment sits
    # near the zero crossing at phase 0
    assert feats[2].max() < 1.0
    assert abs(np.median(feats[2]) - 0.32) < 0.05


# ------------------------------------------------------------------- PNG

def _spec_filter_png(img: np.ndarray, filter_types: list[int]) -> bytes:
    """Independent PNG writer implementing the W3C spec filter formulas
    directly (scalar loops, no shared code with the codec): each row is
    filtered with the given type, then zlib-compressed into a valid PNG.
    Exercises decode_png's unfilter against the published definitions."""
    import struct
    import zlib

    if img.ndim == 2:
        ch, ctype = 1, 0
        flat = img[:, :, None]
    else:
        ch = img.shape[2]
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        flat = img
    h, w = flat.shape[:2]
    stride = w * ch
    rows = flat.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = filter_types[r % len(filter_types)]
        cur = rows[r]
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0            # left
            b = prev[x]                                   # up
            c = prev[x - ch] if x >= ch else 0            # up-left
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (cur[x] - pred) % 256
        out.append(ft)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def test_png_unfilter_all_five_filters_against_spec():
    from anserini_ray.stages.codecs import decode_png

    rng = np.random.default_rng(3)
    for shape in [(11, 7), (9, 5, 2), (8, 13, 3), (6, 4, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in (0, 1, 2, 3, 4):
            got = decode_png(_spec_filter_png(img, [ft]))
            assert got.shape == img.shape, (shape, ft)
            assert np.array_equal(got, img), (shape, ft)
        # mixed filters per row (the realistic encoder output shape)
        got = decode_png(_spec_filter_png(img, [4, 1, 3, 2, 0]))
        assert np.array_equal(got, img), shape


def test_png_roundtrip_and_palette():
    from anserini_ray.stages.codecs import decode_png, encode_png

    rng = np.random.default_rng(4)
    for shape in [(5, 9), (7, 3, 3), (4, 4, 4), (6, 2, 2)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    # hand-built palette (color type 3) file with tRNS
    import struct
    import zlib

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", pal.tobytes())
           + chunk(b"tRNS", bytes([10, 20]))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    got = decode_png(png)
    assert got.shape == (2, 2, 4)
    assert np.array_equal(got[..., :3], pal[idx])
    assert got[0, 0, 3] == 10 and got[0, 1, 3] == 20 and got[1, 0, 3] == 255


def test_png_rejects_unsupported():
    import struct
    import zlib

    from anserini_ray.stages.codecs import decode_png

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    png16 = (b"\x89PNG\r\n\x1a\n"
             + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)))
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(png16)
    adam7 = (b"\x89PNG\r\n\x1a\n"
             + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(adam7)

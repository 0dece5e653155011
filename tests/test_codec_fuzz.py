"""Corrupt-payload robustness: a 100-TB media corpus WILL contain bad
bytes, and a decoding actor must see ValueError / NotImplementedError —
never struct.error, zlib.error, IndexError, KeyError or an allocation
bomb from a flipped dimension field. Seeded bit-flip + truncation fuzz
over every decoder; probe_media must never raise at all."""

import numpy as np
import pytest

from anserini_ray.stages import codecs as C
from anserini_ray.stages import jpeg as J
from anserini_ray.stages import media_meta as M
from anserini_ray.stages.gif import decode_gif, encode_gif

from test_media_meta import _build_mp4, _mp3_frame_bytes, _samples

_OK = (ValueError, NotImplementedError)


def _valid_payloads():
    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    img = pal[rng.integers(0, 16, (24, 31))]
    return {
        "gif": (encode_gif(img), decode_gif),
        "jpeg": (J.encode_jpeg(img), J.decode_jpeg),
        "jpeg_prog": (J.encode_jpeg(img, progressive=True), J.decode_jpeg),
        "png": (C.encode_png(img), C.decode_png),
        "bmp": (C.encode_bmp(img), C.decode_bmp),
        "ppm": (C.encode_ppm(img), C.decode_ppm),
        "wav": (C.encode_wav(np.zeros(500, np.int16), 8000), C.decode_wav),
        "mp4": (_build_mp4(_samples(6)),
                lambda b: (M.parse_mp4(b), M.mp4_sample_table(b))),
        "mp3": (b"".join(_mp3_frame_bytes() for _ in range(4)),
                M.parse_mp3),
    }


def _mutations(buf, rng, trials):
    for trial in range(trials):
        b = bytearray(buf)
        for _ in range(int(rng.integers(1, 6))):
            i = int(rng.integers(0, len(b)))
            b[i] = int(rng.integers(0, 256))
        if trial % 5 == 0:
            b = b[: int(rng.integers(1, len(b)))]
        yield bytes(b)


@pytest.mark.parametrize("fmt", sorted(_valid_payloads()))
def test_decoders_fail_clean_on_corruption(fmt):
    buf, dec = _valid_payloads()[fmt]
    rng = np.random.default_rng(hash(fmt) % (1 << 32))
    for mutated in _mutations(buf, rng, 150):
        try:
            dec(mutated)
        except _OK:
            pass
        # anything else (struct.error, zlib.error, IndexError, KeyError,
        # OverflowError, MemoryError) propagates and fails the test


@pytest.mark.parametrize("fmt", sorted(_valid_payloads()))
def test_probe_media_never_raises(fmt):
    buf, _ = _valid_payloads()[fmt]
    rng = np.random.default_rng(hash(fmt) % (1 << 31))
    for mutated in _mutations(buf, rng, 150):
        out = M.probe_media(mutated)
        assert isinstance(out, dict) and "kind" in out
    # pure junk too — returns the dict, never raises
    for n in (0, 1, 7, 64):
        junk = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        assert isinstance(M.probe_media(junk), dict)


def test_dimension_bombs_rejected():
    import struct

    # GIF with a screen claiming 65535x65535
    g = bytearray(encode_gif(np.zeros((4, 4), np.uint8)))
    struct.pack_into("<HH", g, 6, 65535, 65535)
    with pytest.raises(ValueError):
        decode_gif(bytes(g))
    # JPEG SOF claiming max dims
    j = bytearray(J.encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = j.find(b"\xff\xc0")
    struct.pack_into(">HH", j, sof + 5, 65535, 65535)
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(j))
    # BMP claiming huge dims
    b = bytearray(C.encode_bmp(np.zeros((4, 4, 3), np.uint8)))
    struct.pack_into("<ii", b, 18, 1 << 20, 1 << 20)
    with pytest.raises(ValueError):
        C.decode_bmp(bytes(b))


def test_on_error_skip_drops_bad_rows_keeps_good(ray_session):
    import ray.data

    from anserini_ray.stages.multimodal import (
        ImageResize,
        MediaFeatureExtract,
    )

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    good = encode_gif(pal[rng.integers(0, 8, (20, 24))])
    bad = bytearray(good)
    bad[30:60] = bytes(30)  # corrupt the LZW stream, keep the magic
    rows = [
        {"item_id": 1, "payload": good, "media_type": "image/gif",
         "meta": "{}"},
        {"item_id": 2, "payload": bytes(bad), "media_type": "image/gif",
         "meta": "{}"},
        {"item_id": 3, "payload": good, "media_type": "image/gif",
         "meta": "{}"},
    ]
    ds = ray.data.from_items(rows)
    feats = ds.map_batches(
        MediaFeatureExtract(decoder="numpy", on_error="skip"),
        batch_format="pyarrow", batch_size=8,
    ).take_all()
    assert sorted(r["item_id"] for r in feats) == [1, 3]
    resized = ds.map_batches(
        ImageResize(target_w=10, target_h=8, decoder="numpy",
                    on_error="skip"),
        batch_format="pyarrow", batch_size=8,
    ).take_all()
    assert sorted(r["item_id"] for r in resized) == [1, 3]
    # default on_error="raise" preserves the old contract
    with pytest.raises(Exception):
        ds.map_batches(
            MediaFeatureExtract(decoder="numpy"),
            batch_format="pyarrow", batch_size=8,
        ).take_all()

"""GIF codec (stages/gif.py): lossless round trips across palette sizes
(LZW code-width growth through 512/1024/2048/4096 and the table-cap
clear-restart), interlace, grayscale, transparency compositing, header
walk (gif_info), and the multimodal / probe wiring."""

import struct

import numpy as np
import pytest

from anserini_ray.stages.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_info,
)


def _pal_image(h, w, ncol, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    return pal[rng.integers(0, ncol, (h, w))]


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("hw_ncol", [(1, 1, 1), (7, 9, 2), (33, 47, 5),
                                     (64, 64, 200), (200, 173, 256)])
def test_round_trip_lossless(hw_ncol, interlace):
    h, w, ncol = hw_ncol
    img = _pal_image(h, w, ncol, seed=ncol)
    buf = encode_gif(img, interlace=interlace)
    assert buf[:6] == b"GIF89a" and buf[-1:] == b"\x3b"
    assert np.array_equal(decode_gif(buf), img)


def test_round_trip_grayscale_and_gradient():
    g = np.tile(np.arange(256, dtype=np.uint8), (30, 1))
    out = decode_gif(encode_gif(g))
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_lzw_table_cap_restart():
    # 256-color noise at 256x256 = 64K pixels forces the 4096-entry cap
    # and the encoder's clear-restart path
    img = _pal_image(256, 256, 256, seed=9)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_lzw_kernel_kwkwk_and_codes():
    # "ababab..." produces the KwKwK case immediately
    data = bytes([0, 1] * 50 + [0] * 30)
    enc = _lzw_encode(data, 2)
    assert bytes(_lzw_decode(enc, 2, len(data))) == data


def test_rejects_and_errors():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF0000000")
    with pytest.raises(ValueError):
        encode_gif(_pal_image(40, 40, 300, seed=1))  # >256 colors
    good = encode_gif(_pal_image(16, 16, 8))
    with pytest.raises(ValueError):
        decode_gif(good[: len(good) // 2])


def test_transparency_composites_background():
    # hand-build: 2-color global table, bg=1 (green), one 2x2 image where
    # index 0 is declared transparent -> those pixels keep the background
    gct = bytes([255, 0, 0, 0, 255, 0])  # red, green
    lzw = _lzw_encode(bytes([0, 1, 1, 0]), 2)
    buf = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80, 1, 0)
        + gct
        + b"\x21\xf9\x04\x01\x00\x00\x00\x00"       # GCE: transparent idx 0
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
        + bytes([2, len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    out = decode_gif(buf)
    green = np.array([0, 255, 0], dtype=np.uint8)
    # transparent (idx 0) pixels keep the background green; idx 1 pixels
    # are palette green — the whole screen ends up green
    assert np.array_equal(out, np.broadcast_to(green, (2, 2, 3)))


def test_gif_info_counts_frames():
    img = _pal_image(12, 15, 4)
    buf = bytearray(encode_gif(img))
    info = gif_info(bytes(buf))
    assert (info["width"], info["height"], info["frames"],
            info["version"]) == (15, 12, 1, "89a")
    # splice a second image block before the trailer
    single = bytes(buf)
    body = single[13 + 3 * 4 : -1]  # past header+gct, before trailer
    two = single[:-1] + body + b"\x3b"
    assert gif_info(two)["frames"] == 2


def test_multimodal_and_probe_wiring(ray_session):
    import ray.data

    from anserini_ray.stages.media_meta import probe_media
    from anserini_ray.stages.multimodal import (
        ImageResize,
        MediaFeatureExtract,
    )

    img = _pal_image(24, 31, 16, seed=3)
    buf = encode_gif(img)
    p = probe_media(buf)
    assert (p["kind"], p["codec"], p["width"], p["height"], p["n_units"]) \
        == ("image", "gif", 31, 24, 1)

    ds = ray.data.from_items(
        [{"item_id": "g1", "payload": buf, "media_type": "image/gif",
          "meta": "{}"}]
    )
    feats = ds.map_batches(
        MediaFeatureExtract(decoder="numpy"), batch_format="pyarrow",
        batch_size=4,
    ).take_all()
    v = np.asarray(feats[0]["features"])
    assert v.shape == (128,) and abs(v.sum() - 1.0) < 1e-5

    resized = ds.map_batches(
        ImageResize(target_w=16, target_h=12, decoder="numpy"),
        batch_format="pyarrow", batch_size=4,
    ).take_all()
    out_payload = resized[0]["payload"]
    from anserini_ray.stages import codecs as C

    out = (decode_gif(out_payload) if out_payload[:3] == b"GIF"
           else C.decode_png(out_payload))
    assert out.shape[:2] == (12, 16)

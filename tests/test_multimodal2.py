"""Round-2 multimodal stage family: resize metadata propagation, video
frame-sample fan-out, audio windowing arithmetic, and (fully real) exact
media dedup by content digest."""

import json

import pytest

from anserini_ray.stages.multimodal import (
    AudioWindow,
    ImageResize,
    VideoFrameSample,
    media_exact_dedup,
    synthesize_media_table,
)


def test_image_resize_plumbing(ray_session):
    import ray.data

    t = synthesize_media_table(12, seed=5)
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            ImageResize,
            fn_constructor_kwargs={"target_w": 32, "target_h": 16},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 2),
        )
        .take_all()
    )
    assert len(out) == 12
    by_id = {r["item_id"]: r for r in out}
    src = {r["item_id"]: r for r in t.to_pylist()}
    for i, r in by_id.items():
        if r["media_type"].startswith("image/"):
            assert len(r["payload"]) == 32 * 16
            m = json.loads(r["meta"])
            assert (m["w"], m["h"]) == (32, 16)
        else:  # non-images pass through untouched
            assert r["payload"] == src[i]["payload"]
    # deterministic across runs
    out2 = (
        ray.data.from_arrow(t)
        .map_batches(
            ImageResize,
            fn_constructor_kwargs={"target_w": 32, "target_h": 16},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    assert {r["item_id"]: r["payload"] for r in out2} == {
        r["item_id"]: r["payload"] for r in out
    }
    with pytest.raises(NotImplementedError):
        ImageResize(decoder="none")._resize(b"x")


def test_video_frame_sample_fanout(ray_session):
    import ray.data

    t = synthesize_media_table(12, seed=6)
    frames = (
        ray.data.from_arrow(t)
        .map_batches(
            VideoFrameSample,
            fn_constructor_kwargs={"stride": 15, "max_frames": 4},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    vids = {r["item_id"] for r in t.to_pylist() if r["media_type"].startswith("video/")}
    assert {r["item_id"] for r in frames} == vids
    for r in frames:
        assert r["media_type"] == "image/raw"
        assert r["frame_idx"] % 15 == 0
    # per-video counts: min(ceil(frames/15), 4)
    metas = {r["item_id"]: json.loads(r["meta"]) for r in t.to_pylist()}
    from collections import Counter

    got = Counter(r["item_id"] for r in frames)
    for vid in vids:
        expect = min(-(-metas[vid]["frames"] // 15), 4)
        assert got[vid] == expect


def test_audio_window_arithmetic(ray_session):
    import ray.data

    t = synthesize_media_table(12, seed=7)
    wins = (
        ray.data.from_arrow(t)
        .map_batches(
            AudioWindow,
            fn_constructor_kwargs={"window_s": 1.0, "hop_s": 0.5},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    auds = {
        r["item_id"]: json.loads(r["meta"])
        for r in t.to_pylist()
        if r["media_type"].startswith("audio/")
    }
    from collections import Counter

    got = Counter(r["item_id"] for r in wins)
    for aid, m in auds.items():
        # windows of 1s at 0.5s hop over `seconds`: 2*seconds - 1
        assert got[aid] == int(2 * m["seconds"] - 1)
    for r in wins:
        assert len(r["payload"]) > 0
        assert r["start_s"] == r["window_idx"] * 0.5


def test_media_exact_dedup(ray_session):
    import pyarrow as pa

    import ray.data

    t = synthesize_media_table(9, seed=8)
    # plant duplicates of item 0's payload under new ids
    dup = pa.table(
        {
            "item_id": pa.array([100, 101], type=pa.int64()),
            "payload": pa.array(
                [t["payload"][0].as_py()] * 2, type=pa.large_binary()
            ),
            "media_type": pa.array(["image/png"] * 2),
            "meta": pa.array(["{}"] * 2),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, dup]))
    groups = media_exact_dedup(ds).take_all()
    by_rep = {r["rep_item_id"]: r["dup_count"] for r in groups}
    assert by_rep[0] == 3          # original + 2 planted copies
    assert sum(by_rep.values()) == 11
    assert len(by_rep) == 9        # 9 distinct payloads


def test_image_resize_and_features_accept_png(ray_session):
    """decoder="numpy" now covers PNG (round 5): resize re-encodes a valid
    PNG at the target dims; feature extraction matches the equivalent PPM's
    luminance histogram bit-for-bit (same pixels, different container)."""
    import json

    import numpy as np
    import pyarrow as pa

    from anserini_ray.stages.codecs import decode_png, encode_png, encode_ppm
    from anserini_ray.stages.multimodal import ImageResize, MediaFeatureExtract

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(19, 13, 3), dtype=np.uint8)
    png, ppm = encode_png(img), encode_ppm(img)

    batch = pa.Table.from_arrays(
        [
            pa.array(["a", "b"]),
            pa.array([png, ppm], type=pa.large_binary()),
            pa.array(["image/png", "image/x-portable-pixmap"]),
            pa.array([json.dumps({"w": 13, "h": 19})] * 2),
        ],
        names=["item_id", "payload", "media_type", "meta"],
    )
    out = ImageResize(target_w=8, target_h=6, decoder="numpy")(batch)
    resized = decode_png(out["payload"][0].as_py())
    assert resized.shape == (6, 8, 3)
    assert json.loads(out["meta"][0].as_py()) == {"w": 8, "h": 6}

    feats = MediaFeatureExtract(decoder="numpy", feature_dim=32)(batch)
    f_png = np.array(feats["features"][0].as_py())
    f_ppm = np.array(feats["features"][1].as_py())
    assert np.array_equal(f_png, f_ppm)

"""Media-layer throughput bench: synthesize a mixed media parquet corpus
(GIF / baseline+progressive JPEG / WAV / MP4, real payloads from the
stdlib codecs), then measure the two pipeline shapes over it at full
width:

  1. MediaMetadata        — header-only probe (the routing first pass)
  2. ImageResize          — decode -> bilinear resize -> re-encode
                            (decode-bound, on_error="skip")

Usage: python scripts/media_bench.py [n_items] [num_cpus]
Prints one JSON line; corpus is cached under /tmp by (n, seed).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_shard(shard: int, n: int, seed: int):
    import pyarrow as pa

    from anserini_ray.stages import codecs as C
    from anserini_ray.stages import jpeg as J
    from anserini_ray.stages.gif import encode_gif
    from anserini_ray.stages.media_meta import mux_mp4

    rng = np.random.default_rng(seed + shard)
    ids, payloads, types = [], [], []
    for i in range(n):
        gid = shard * n + i
        kind = gid % 5
        h, w = int(rng.integers(24, 64)), int(rng.integers(24, 64))
        if kind in (0, 1):
            pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
            img = pal[rng.integers(0, 32, (h, w))]
            if kind == 0:
                payloads.append(encode_gif(img))
                types.append("image/gif")
            else:
                payloads.append(J.encode_jpeg(img, quality=80))
                types.append("image/jpeg")
        elif kind == 2:
            pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
            img = pal[rng.integers(0, 32, (h, w))]
            payloads.append(J.encode_jpeg(img, quality=80,
                                          progressive=True))
            types.append("image/jpeg")
        elif kind == 3:
            ns = int(rng.integers(800, 4000))
            payloads.append(C.encode_wav(
                (rng.standard_normal(ns) * 8000).astype(np.int16), 16000))
            types.append("audio/wav")
        else:
            samples = [bytes(rng.integers(0, 256, int(rng.integers(
                40, 400))).astype(np.uint8).tobytes()) for _ in range(8)]
            payloads.append(mux_mp4(samples, width=w, height=h))
            types.append("video/mp4")
        ids.append(gid)
    return pa.table({
        "item_id": pa.array(ids, type=pa.int64()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "media_type": pa.array(types),
        "meta": pa.array(["{}"] * len(ids)),
    })


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    import pyarrow.parquet as pq

    import ray.data

    corpus = f"/tmp/anserini_ray_media_{n_items}"
    nshards = max(8, num_cpus)
    per = n_items // nshards
    if not os.path.isdir(corpus) or len(os.listdir(corpus)) != nshards:
        os.makedirs(corpus, exist_ok=True)
        synth = ray.remote(synth_shard)
        tables = ray.get([synth.remote(s, per, 42) for s in range(nshards)])
        for s, t in enumerate(tables):
            pq.write_table(t, f"{corpus}/shard_{s:03d}.parquet")

    from anserini_ray.stages.media_meta import MediaMetadata
    from anserini_ray.stages.multimodal import ImageResize

    total = per * nshards
    out = {"n_items": total, "num_cpus": num_cpus}

    t0 = time.perf_counter()
    n_meta = (
        ray.data.read_parquet(corpus, columns=["item_id", "payload"])
        .map_batches(MediaMetadata(), batch_format="pyarrow",
                     batch_size=256)
        .count()
    )
    dt = time.perf_counter() - t0
    assert n_meta == total
    out["probe_items_per_sec"] = round(total / dt, 1)
    out["probe_sec"] = round(dt, 2)

    t0 = time.perf_counter()
    n_res = (
        ray.data.read_parquet(corpus)
        .map_batches(
            ImageResize(target_w=32, target_h=32, decoder="numpy",
                        on_error="skip"),
            batch_format="pyarrow", batch_size=64,
            concurrency=num_cpus,
        )
        .count()
    )
    dt = time.perf_counter() - t0
    out["resize_rows_per_sec"] = round(n_res / dt, 1)
    out["resize_sec"] = round(dt, 2)
    out["resize_rows"] = n_res  # images resized + non-images passed through
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

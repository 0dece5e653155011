"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (the image/audio libraries are not
available in this environment): ``decoder="none"`` raises
NotImplementedError at the decode call, ``decoder="fake"`` is a
deterministic stand-in (hash-seeded pixel/sample statistics) so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is real
and tested end-to-end.

Schema convention:
    payload: binary        the encoded media bytes
    media_type: string     e.g. "image/png", "audio/wav"
    meta: string (JSON)    width/height/duration/etc.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("media_type", pa.string()),
        ("meta", pa.string()),
    ]
)


def synthesize_media_table(n: int, seed: int = 42, payload_size: int = 4096) -> pa.Table:
    """Deterministic fake media corpus (opaque bytes) for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_size, dtype=np.uint8).tobytes() for _ in range(n)]
    types = [("image/png", "audio/wav")[i % 2] for i in range(n)]
    metas = [
        json.dumps(
            {"w": 64 + (i % 8) * 32, "h": 64, "frames": 1}
            if i % 2 == 0
            else {"sr": 16000, "seconds": 1 + (i % 5)}
        )
        for i in range(n)
    ]
    return pa.table(
        {
            "item_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_type": pa.array(types),
            "meta": pa.array(metas),
        }
    )


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives a fixed-length
    feature vector from a stable digest of the payload."""
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer((h * 4)[:128], dtype=np.uint8).astype(np.float32) / 255.0
    )


class MediaFeatureExtract:
    """Actor-pool stage: decode → feature-extract.

    Real deployments pass ``decoder="<library>"`` and implement `_decode`;
    here "none" raises NotImplementedError (clearly-marked stub) and "fake"
    uses the deterministic digest features. Use small batch_size for large
    payloads (batch_bytes ≈ payload_size × batch_size × concurrency must fit
    the worker heap)."""

    def __init__(self, decoder: str = "fake", feature_dim: int = 128):
        self.decoder = decoder
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.decoder == "fake":
            return _fake_decode(payload, media_type)
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; plug a decoder in here"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        feats = np.stack(
            [self._decode(p, t)[: self.feature_dim] for p, t in zip(payloads, types)]
        )
        off = pa.array(
            np.arange(0, (len(payloads) + 1) * self.feature_dim, self.feature_dim,
                      dtype=np.int32)
        )
        feat_col = pa.ListArray.from_arrays(
            off, pa.array(feats.reshape(-1), type=pa.float32())
        )
        return pa.Table.from_arrays(
            [batch["item_id"], batch["media_type"], feat_col],
            names=["item_id", "media_type", "features"],
        )


def media_pipeline(media_ds, decoder: str = "fake", concurrency=(1, 8), batch_size: int = 64):
    """read → actor-pool decode/feature-extract (binary payloads => small
    batches; stateful decoder built once per actor)."""
    return media_ds.map_batches(
        MediaFeatureExtract,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

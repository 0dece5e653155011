"""External-model scoring hook — the reference shells out to
`python3 <model> -content ...` per doc/query (`SLRGenerator.java:157-176`,
`SLRQueryGenerator.java:82-100`). The Ray-native shape is an actor-pool
map_batches stage: the model loads ONCE per actor (`__init__`), batches of
texts are scored per `__call__`.

Model loading is injected via a registry name or import path; this
environment ships no model libraries, so `model="fake"` provides a
deterministic digest-based stand-in (like stages/multimodal.py) keeping the
plumbing real and testable — swap in a real loader in deployment.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MODEL_REGISTRY: dict = {}


def register_model(name: str, loader) -> None:
    """loader: () -> callable(list[str]) -> np.ndarray (batch scores or
    (n, d) activations)."""
    _MODEL_REGISTRY[name] = loader


def _fake_loader():
    def score(texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), 8), dtype=np.float32)
        for i, t in enumerate(texts):
            h = hashlib.sha256((t or "").encode()).digest()
            out[i] = np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0
        return out

    return score


register_model("fake", _fake_loader)


class ModelScoreStage:
    """map_batches callable class: texts -> model outputs column.

    Usage: ds.map_batches(ModelScoreStage, fn_constructor_args=("fake",),
    concurrency=N, batch_size=B, num_cpus=c) — model built once per actor."""

    def __init__(self, model: str = "fake", text_col: str = "text",
                 out_col: str = "model_output"):
        if model == "fake":
            loader = _fake_loader
        elif model in _MODEL_REGISTRY:
            loader = _MODEL_REGISTRY[model]
        elif ":" in model:  # "pkg.module:loader_fn" import path
            import importlib

            mod, _, fn = model.partition(":")
            loader = getattr(importlib.import_module(mod), fn)
        else:
            raise NotImplementedError(
                f"model {model!r} not registered; real model libraries are "
                "not available in this environment — register a loader via "
                "register_model() or pass an import path 'pkg.mod:loader'"
            )
        self.model = loader()
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = self.model(batch[self.text_col].to_pylist())
        scores = np.asarray(scores)
        if scores.ndim == 1:
            col = pa.array(scores.astype(np.float32))
        else:
            off = pa.array(
                np.arange(0, (len(batch) + 1) * scores.shape[1],
                          scores.shape[1], dtype=np.int32)
            )
            col = pa.ListArray.from_arrays(
                off, pa.array(scores.reshape(-1).astype(np.float32))
            )
        return batch.append_column(self.out_col, col)

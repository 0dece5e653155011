"""Vectorized text-stats kernels must be bit-identical to their scalar
definitions (the scalar form IS the spec; the batch form is the engine)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _scalar(texts):
    import warnings

    from anserini_ray.stages.text_stats import rolling_fingerprint

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return [rolling_fingerprint(t or "") for t in texts]


def _batch(texts):
    from anserini_ray.stages.text_stats import rolling_fingerprints_batch

    return list(rolling_fingerprints_batch(texts))


def test_fingerprint_batch_matches_scalar_edge_cases():
    texts = [
        "",
        None,
        "a",
        "hello world",
        "héllo wörld — unicode ✓   ",
        "x" * 10_000,
        "y" * 3,
        "\x00\x01\xff",
        "日本語のテキスト",
        "tail",
    ]
    assert _batch(texts) == _scalar(texts)


def test_fingerprint_batch_submatrix_split():
    # force the matrix-budget split path: shrink the budget so the
    # length-sorted batch is processed in several sub-batches
    from anserini_ray.stages import text_stats as TS

    texts = [("doc%d " % i) * (1 + 7 * (i % 13)) for i in range(100)]
    old = TS._FP_MATRIX_BUDGET
    try:
        TS._FP_MATRIX_BUDGET = 256  # bytes — many tiny sub-batches
        got = _batch(texts)
    finally:
        TS._FP_MATRIX_BUDGET = old
    assert got == _scalar(texts)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=200), max_size=30))
def test_fingerprint_batch_matches_scalar_fuzz(texts):
    assert _batch(texts) == _scalar(texts)

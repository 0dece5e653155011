"""SLR (sparse latent retrieval — the fork's signature subsystem) vs a
numpy quantized-dot-product oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anserini_ray.analysis.analyzer import SLRAnalyzer

F = np.float32
PRECISION = 2


def test_slr_analyzer_tokenization():
    a = SLRAnalyzer(precision=3)
    terms, tfs = a.analyze_with_tfs("0.0 0.531 0.0 0.0021 1.0e-03")
    # dim1: 0.531 -> "531"; dim3: 0.0021 -> "002"; dim4: 0.001 -> "001"
    assert terms == ["00001", "00003", "00004"]
    assert tfs == [531, 2, 1]
    # zero activations and sub-precision values are dropped
    t2, f2 = SLRAnalyzer(precision=2).analyze_with_tfs("0.001 0.0")
    assert t2 == [] and f2 == []


def test_slr_scientific_normalization():
    assert SLRAnalyzer._normalize("5.31e-03") == "0.00531"
    assert SLRAnalyzer._normalize("0.25") == "0.25"


@pytest.fixture(scope="module")
def slr_index(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.sources.transcripts import TRANSCRIPT_SCHEMA

    rng = np.random.default_rng(77)
    n, dim = 200, 32
    vecs = np.where(rng.random((n, dim)) < 0.2, rng.random((n, dim)), 0.0)
    texts = [" ".join(f"{v:.4f}" for v in vecs[i]) for i in range(n)]
    table = pa.Table.from_arrays(
        [
            pa.array([f"vec-{i:06d}" for i in range(n)]),
            pa.array([0] * n, type=pa.int32()),
            pa.array(["vec"] * n),
            pa.array(texts),
            pa.array([""] * n),
            pa.array([0] * n, type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )
    tmp = tmp_path_factory.mktemp("slr")
    p = str(tmp / "c.parquet")
    pq.write_table(table, p)
    idx = str(tmp / "idx")
    build_index(
        ray.data.read_parquet(p),
        idx,
        IndexConfig(
            seg_shift=6, analyzer={"type": "slr", "precision": PRECISION}
        ),
        input_files=[p],
    )
    return idx, vecs


def test_slr_dot_product_matches_oracle(slr_index):
    from anserini_ray.search import LocalSearcher

    idx, vecs = slr_index
    s = LocalSearcher(
        idx,
        similarity="slr",
        sim_params={"precision": PRECISION},
        analyzer_config={"type": "slr", "precision": PRECISION},
    )
    rng = np.random.default_rng(5)
    # quantized doc tf exactly as indexed: the first p decimal digits of the
    # FORMATTED string (float flooring would mis-truncate values like 0.29)
    def tf_of(v: float) -> int:
        frac = f"{v:.4f}".split(".")[1][:PRECISION]
        return int(frac)

    qtf = np.vectorize(tf_of)(vecs)
    for trial in range(3):
        q = np.where(rng.random(vecs.shape[1]) < 0.3, rng.random(vecs.shape[1]), 0.0)
        qtext = " ".join(f"{v:.4f}" for v in q)
        docids, scores = s.search_slr(qtext, k=20, adjust_ties=False)
        qq = np.array([float(f"{v:.4f}") for v in q])
        # oracle: float32 per-clause contributions accumulated per doc
        exact = np.zeros(len(vecs), dtype=np.float32)
        for i in np.flatnonzero(qq):
            contrib = (qq[i] * qtf[:, i].astype(np.float64) / 10**PRECISION)
            mask = qtf[:, i] >= 1
            exact[mask] += contrib.astype(np.float32)[mask]
        order = sorted(
            np.flatnonzero(exact > 0),
            key=lambda j: (-exact[j], f"vec-{j:06d}:0"),
        )[:20]
        want = [f"vec-{j:06d}:0" for j in order]
        assert docids == want, f"trial {trial}"
        np.testing.assert_allclose(
            np.asarray(scores), exact[order], rtol=2e-6, atol=1e-7
        )


def test_slr_sparsity_exploited(slr_index):
    """Posting lists are per-dimension: a query touching few dims touches
    few postings (the efficiency argument of the reference README)."""
    from anserini_ray.search import LocalSearcher

    idx, vecs = slr_index
    s = LocalSearcher(
        idx, similarity="slr", sim_params={"precision": PRECISION},
        analyzer_config={"type": "slr", "precision": PRECISION},
    )
    r = s.readers[0]
    terms = list(r.iter_terms())
    assert all(t.startswith("000") and len(t) == 5 for t, _, _ in terms)
    dfs = [df for _, df, _ in terms]
    assert max(dfs) < len(vecs)  # sparse: no dim hits every doc

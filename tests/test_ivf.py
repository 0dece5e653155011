"""IVF coarse-quantizer ANN (stages/ann.py): exactness in the degenerate
full-probe case, determinism, and recall against brute force."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )


def _queries():
    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    vid = t["vec_id"].to_numpy()
    return np.stack(
        [
            np.asarray(t["embedding"][int(np.flatnonzero(vid == q)[0])].as_py())
            for q in (0, 1, 2)
        ]
    )


def test_ivf_full_probe_equals_brute_force(emb_ds):
    from anserini_ray.stages.ann import brute_force_cosine_topk, ivf_topk

    q = _queries()
    exact = brute_force_cosine_topk(emb_ds, q, k=5, round_decimals=None)
    ivf = ivf_topk(emb_ds, q, k=5, nlist=8, nprobe=8, round_decimals=None)
    assert ivf["vec_id"].to_pylist() == exact["vec_id"].to_pylist()
    assert np.allclose(ivf["cosine"].to_numpy(), exact["cosine"].to_numpy())


def test_ivf_partial_probe_recall(emb_ds):
    from anserini_ray.stages.ann import brute_force_cosine_topk, ivf_topk

    q = _queries()
    exact = brute_force_cosine_topk(emb_ds, q, k=5, round_decimals=None)
    ivf = ivf_topk(emb_ds, q, k=5, nlist=16, nprobe=6)
    # query vectors are themselves corpus members: rank-1 self hit survives
    got = {
        (r["query_idx"], r["vec_id"])
        for r in ivf.to_pylist()
        if r["rank"] == 1
    }
    assert got == {(0, 0), (1, 1), (2, 2)}
    # recall@5 vs brute force
    ex_sets = {}
    for r in exact.to_pylist():
        ex_sets.setdefault(r["query_idx"], set()).add(r["vec_id"])
    iv_sets = {}
    for r in ivf.to_pylist():
        iv_sets.setdefault(r["query_idx"], set()).add(r["vec_id"])
    recalls = [
        len(ex_sets[qi] & iv_sets.get(qi, set())) / len(ex_sets[qi])
        for qi in ex_sets
    ]
    assert np.mean(recalls) >= 0.6  # probing 6/16 cells


def test_ivf_deterministic(emb_ds):
    from anserini_ray.stages.ann import ivf_topk, train_ivf_centroids

    c1 = train_ivf_centroids(emb_ds, nlist=8)
    c2 = train_ivf_centroids(emb_ds, nlist=8)
    assert np.array_equal(c1, c2)
    q = _queries()
    a = ivf_topk(emb_ds, q, k=5, nlist=8, nprobe=3)
    b = ivf_topk(emb_ds, q, k=5, nlist=8, nprobe=3)
    assert a.equals(b)

"""stages/hashagg.py — Arrow-kernel distributed hash aggregate."""

import numpy as np
import pyarrow as pa

import ray.data


def test_hash_aggregate_matches_pyarrow_reference(ray_session):
    from anserini_ray.stages.hashagg import hash_aggregate

    rng = np.random.default_rng(5)
    n = 20_000
    keys = [f"k{int(i):04d}" for i in rng.integers(0, 500, size=n)]
    vals = rng.integers(-100, 100, size=n)
    tbl = pa.table({"k": keys, "v": vals})
    ds = ray.data.from_arrow(tbl).repartition(7)
    out = hash_aggregate(
        ds, ["k"],
        [("count", None), ("sum", "v"), ("min", "v"), ("max", "v")],
        ["n", "s", "mn", "mx"],
    ).take_all()
    got = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in out}
    ref_tbl = (
        tbl.group_by(["k"])
        .aggregate([([], "count_all"), ("v", "sum"), ("v", "min"), ("v", "max")])
    )
    ref = {
        k: (c, s, mn, mx)
        for k, c, s, mn, mx in zip(
            ref_tbl["k"].to_pylist(),
            ref_tbl["count_all"].to_pylist(),
            ref_tbl["v_sum"].to_pylist(),
            ref_tbl["v_min"].to_pylist(),
            ref_tbl["v_max"].to_pylist(),
        )
    }
    assert got == ref


def test_hash_aggregate_multi_key_and_empty_blocks(ray_session):
    from anserini_ray.stages.hashagg import hash_aggregate

    tbl = pa.table(
        {
            "a": ["x", "x", "y", "y", "y"],
            "b": [1, 1, 1, 2, 2],
            "v": [10, 20, 30, 40, 50],
        }
    )
    out = hash_aggregate(
        ray.data.from_arrow(tbl).repartition(4),
        ["a", "b"],
        [("sum", "v")],
        ["s"],
        nparts=3,
    ).take_all()
    got = {(r["a"], r["b"]): r["s"] for r in out}
    assert got == {("x", 1): 30, ("y", 1): 30, ("y", 2): 90}

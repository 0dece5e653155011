"""optimize_index (force-merge analog): compacts multi-run posting lists to
single runs with identical search results."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from anserini_ray.sources import generate_transcripts


def test_optimize_preserves_results(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.index.optimize import optimize_index
    from anserini_ray.search import LocalSearcher

    tmp = tmp_path_factory.mktemp("opt")
    p = str(tmp / "c.parquet")
    pq.write_table(generate_transcripts(1200, seed=91), p)
    idx = str(tmp / "idx")
    build_index(
        ray.data.read_parquet(p),
        idx,
        # tiny encode batches force many runs per (segment, term)
        IndexConfig(seg_shift=9, encode_batch_size=64, store_positions=True),
        input_files=[p],
    )
    s0 = LocalSearcher(idx)
    multi_run_terms = sum(
        1
        for r in s0.readers
        for _, (lo, hi) in r._term_range.items()
        if hi - lo > 1
    )
    assert multi_run_terms > 0  # precondition: something to compact
    queries = ["merge sort", "pipeline", "zq0007", "window stream batch"]
    before = {q: s0.search(q, k=30, adjust_ties=False) for q in queries}
    phrase_before = s0.phrase_search("merge sort", k=10, adjust_ties=False)

    optimize_index(idx)

    s1 = LocalSearcher(idx)
    for r in s1.readers:
        assert all(hi - lo == 1 for (lo, hi) in r._term_range.values())
    for q in queries:
        d0, sc0 = before[q]
        d1, sc1 = s1.search(q, k=30, adjust_ties=False)
        assert d0 == d1, q
        assert np.array_equal(np.asarray(sc0), np.asarray(sc1)), q
    p1 = s1.phrase_search("merge sort", k=10, adjust_ties=False)
    assert phrase_before[0] == p1[0]
    # pruned mode still exact on the compacted index
    s2 = LocalSearcher(idx, prune=True)
    d2, _ = s2.search("merge sort", k=30, adjust_ties=False)
    assert d2 == before["merge sort"][0]


def _termstats_rows(idx: str, seg: int):
    import os

    part = os.path.join(idx, "termstats", f"segment_id={seg}")
    return pq.read_table(part, columns=["term", "gdf", "gcf"]).sort_by("term")


def test_termstats_swap_crash_recovery(ray_session, tmp_path_factory):
    """A crash between the two os.replace calls of a termstats partition
    swap leaves the live dir missing with the original in .old and the
    deduped copy in .optimizing. Both recovery entry points (the next
    optimize run and recover_interrupted_optimize, which readers call)
    must restore the partition instead of deleting the backups."""
    import os
    import shutil

    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.index.optimize import (
        optimize_index,
        recover_interrupted_optimize,
    )

    tmp = tmp_path_factory.mktemp("ts_crash")
    p = str(tmp / "c.parquet")
    pq.write_table(generate_transcripts(400, seed=17), p)
    idx = str(tmp / "idx")
    build_index(
        ray.data.read_parquet(p),
        idx,
        IndexConfig(seg_shift=8, encode_batch_size=64),
        input_files=[p],
    )
    segs = sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(os.path.join(idx, "termstats"))
        if e.startswith("segment_id=") and "." not in e.split("=", 1)[1]
    )
    assert len(segs) >= 2
    golden = {s: _termstats_rows(idx, s) for s in segs}

    def simulate_crash(seg: int):
        """Reproduce the exact mid-swap state: live gone, .old = original,
        .optimizing = a complete rewritten copy."""
        part = os.path.join(idx, "termstats", f"segment_id={seg}")
        shutil.copytree(part, part + ".optimizing")
        os.replace(part, part + ".old")

    # Entry point 1: a subsequent optimize run's cleanup path.
    simulate_crash(segs[0])
    optimize_index(idx, segments=[segs[0]])
    assert _termstats_rows(idx, segs[0]).equals(golden[segs[0]])
    assert not os.path.exists(
        os.path.join(idx, "termstats", f"segment_id={segs[0]}.old")
    )

    # Entry point 2: reader-side recovery.
    simulate_crash(segs[1])
    recover_interrupted_optimize(idx)
    assert _termstats_rows(idx, segs[1]).equals(golden[segs[1]])
    for e in os.listdir(os.path.join(idx, "termstats")):
        assert not e.endswith(".old") and not e.endswith(".optimizing")

    # Late-crash variant: .old already deleted, only .optimizing remains —
    # the complete deduped copy must be promoted, not discarded.
    part = os.path.join(idx, "termstats", f"segment_id={segs[1]}")
    os.replace(part, part + ".optimizing")
    recover_interrupted_optimize(idx)
    assert _termstats_rows(idx, segs[1]).equals(golden[segs[1]])

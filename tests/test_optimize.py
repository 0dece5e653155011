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

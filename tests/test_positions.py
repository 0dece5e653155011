"""Positional postings + phrase search."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.sources.transcripts import TRANSCRIPT_SCHEMA

    texts = [
        "the quick brown fox jumps",
        "quick brown dog sleeps",
        "a brown quick reversal",
        "quick and also brown",
        "totally unrelated text here",
        "quick brown quick brown repeated phrases",
    ]
    n = len(texts)
    table = pa.Table.from_arrays(
        [
            pa.array([f"conv-{i:06d}" for i in range(n)]),
            pa.array([0] * n, type=pa.int32()),
            pa.array(["user"] * n),
            pa.array(texts),
            pa.array([""] * n),
            pa.array([1767225600_000000 + i for i in range(n)], type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )
    tmp = tmp_path_factory.mktemp("pos")
    p = str(tmp / "c.parquet")
    pq.write_table(table, p)
    idx = str(tmp / "idx")
    build_index(
        ray.data.read_parquet(p),
        idx,
        IndexConfig(seg_shift=4, store_positions=True),
        input_files=[p],
    )
    return idx


def test_positions_roundtrip(pos_index):
    from anserini_ray.search import LocalSearcher

    s = LocalSearcher(pos_index)
    r = s.readers[0]
    ords, tfs, flat, offs = r.positions("quick")
    # doc0 "the quick..." -> analyzed: [quick, brown, fox, jump] pos0
    by_doc = {
        r.doc_id_strings(np.array([o]))[0]: flat[offs[i] : offs[i + 1]].tolist()
        for i, o in enumerate(ords)
    }
    # "the" is a stopword but still consumes position 0 (Lucene position
    # increments), so "quick" sits at position 1 in doc0
    assert by_doc["conv-000000:0"] == [1]
    assert by_doc["conv-000005:0"] == [0, 2]


def test_exact_phrase(pos_index):
    from anserini_ray.search import LocalSearcher

    s = LocalSearcher(pos_index)
    docids, scores = s.phrase_search("quick brown", k=10)
    assert set(docids) == {"conv-000000:0", "conv-000001:0", "conv-000005:0"}
    assert all(scores[i] > scores[i + 1] for i in range(len(scores) - 1))
    # reversed order does NOT match the phrase
    docids_r, _ = s.phrase_search("brown quick", k=10)
    assert "conv-000002:0" in docids_r
    assert "conv-000000:0" not in docids_r


def test_phrase_with_slop(pos_index):
    from anserini_ray.search import LocalSearcher

    s = LocalSearcher(pos_index)
    d0, _ = s.phrase_search("quick also", k=10, slop=0)
    assert d0 == []
    d1, _ = s.phrase_search("quick also", k=10, slop=1)
    assert d1 == ["conv-000003:0"]  # "quick [and] also": gap 2 via stopword slot


def test_positions_error_without_flag(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.search import LocalSearcher
    from anserini_ray.sources import generate_transcripts

    tmp = tmp_path_factory.mktemp("nopos")
    p = str(tmp / "c.parquet")
    pq.write_table(generate_transcripts(100, seed=5), p)
    idx = str(tmp / "idx")
    build_index(ray.data.read_parquet(p), idx, IndexConfig(seg_shift=6), input_files=[p])
    s = LocalSearcher(idx)
    with pytest.raises(ValueError, match="store_positions"):
        s.phrase_search("merge sort")

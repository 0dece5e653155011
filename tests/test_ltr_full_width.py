"""Round-2 LTR extractor additions: CountBigramPairs-equivalent window
counts (sequential + all-query-pairs), the SDM feature's quirky scoring,
tweet-term counts, and metadata passthrough features."""

import math

import numpy as np
import pyarrow as pa
import pytest

from anserini_ray.pipelines.ltr import (
    FEATURE_NAMES,
    _count_pairs,
    _sdm_feature,
    _stream_from_posmap,
)


def test_count_pairs_semantics():
    #         0  1  2  3  4  5  6
    stream = ["a", "x", "b", "x", "a", "b", "b"]
    fwd = {"a": {"b"}}
    bwd = {"b": {"a"}}
    oc = _count_pairs(stream, fwd, None, (2, 8))
    # ordered within gap 2: a@0->b@2 (d2); a@4->b@5,b@6 (d1,d2) => 3
    assert oc[2] == {"a": 3}
    # gap 8 adds nothing new beyond all pairs: a@0->b@2,5,6; a@4->b@5,6 => 5
    assert oc[8] == {"a": 5}
    uc = _count_pairs(stream, fwd, bwd, (2,))
    # backward: b-before-a within 2: b@2..a@4 (d2) => +1 credited to 'a'
    assert uc[2] == {"a": 4}


def test_sdm_feature_hand_computed():
    stream = ["q1", "q2", "z", "q1", "q2"]
    q = ["q1", "q2"]
    got = _sdm_feature(stream, q)
    # independence: counts {q1:2, q2:2, z:1}, denom 6
    ind = math.log(3 / 6) + math.log(3 / 6) + math.log(2 / 6)
    # ordered: q1->q2 adjacent occurs twice; phrase {q1:2}
    ordered = math.log(3 / 6)
    # unordered: window pass counts both co-occurrences
    unordered = math.log(2 / 6)
    want = 0.5 * ind + 0.2 * ordered + 0.3 * unordered
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_stream_reconstruction():
    posmap = {"b": [1, 3], "a": [0], "c": [2]}
    assert _stream_from_posmap(posmap) == ["a", "b", "c", "b"]


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index

    rows = pa.table(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "text": [
                "merge sort algorithm beats bubble sort merge routines",
                "completely unrelated text about gardening flowers",
            ],
        }
    )
    idx = str(tmp_path_factory.mktemp("ltrw") / "idx")
    build_index(
        ray.data.from_arrow(rows),
        idx,
        IndexConfig(seg_shift=4, store_docvecs=True, store_positions=True),
        input_files=[],
    )
    return idx


def test_full_width_features_and_passthrough(pos_index):
    from anserini_ray.pipelines.ltr import extract_features

    pairs = pa.table(
        {
            "qid": pa.array([1], type=pa.int32()),
            "query": ["merge sort"],
            "doc_id": ["c1:0"],
            "followers_count": pa.array([123], type=pa.int64()),
            "is_reply": pa.array([1], type=pa.int64()),
        }
    )
    row = extract_features(pos_index, pairs).take_all()[0]
    for name in FEATURE_NAMES:
        assert name in row
    # doc: merge sort algorithm beat(s) bubble sort merge routine(s)
    # ordered 'merge'->'sort' within gap8: merge@0->sort@1,sort@5; merge@6->(none after within text) => 2
    assert row["ordered_pairs"] == 2.0
    # unordered adds sort-before-merge: sort@1->merge@6 (d5), sort@5->merge@6 (d1) => +2
    assert row["unordered_pairs"] == 4.0
    assert row["ordered_all_pairs"] == row["ordered_pairs"]  # 2-term query
    assert row["sdm"] != 0.0
    assert row["hashtag_count"] == 0.0 and row["link_count"] == 0.0
    assert row["followers_count"] == 123.0
    assert row["is_reply"] == 1.0
    assert row["friends_count"] == 0.0  # absent column -> 0
    # gap monotonicity
    assert row["ordered_pairs_6"] <= row["ordered_pairs"] <= row["ordered_pairs_10"]

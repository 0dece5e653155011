"""Background-linking search (reference SearchCollection.java:488-564 +
NewsBackgroundLinkingReranker): per-paragraph tf-idf query construction,
round-robin merge with rank scores, cosine near-dup removal, exclusion
filter (kicker analog)."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def bl_index(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index

    texts = {
        "news:0": "solar panels power the growing renewable energy market today",
        "news:1": "renewable energy adoption grows as solar panel costs fall",
        # exact near-dup of news:0 (same tokens)
        "dup:0": "solar panels power the growing renewable energy market today",
        "other:0": "baseball season opens with a dramatic nine inning game",
        "other:1": "the stock market closed higher on energy sector gains",
        "op:0": "opinion column about solar energy politics and power markets",
    }
    rows = pa.table(
        {
            "conv_id": [k.split(":")[0] for k in texts],
            "turn_idx": pa.array(
                [int(k.split(":")[1]) for k in texts], type=pa.int32()
            ),
            "text": list(texts.values()),
        }
    )
    idx = str(tmp_path_factory.mktemp("bl") / "idx")
    build_index(
        ray.data.from_arrow(rows).sort(["conv_id", "turn_idx"]),
        idx,
        IndexConfig(seg_shift=4, store_docvecs=True),
        input_files=[],
    )
    return idx, texts


def test_background_linking_whole_doc(bl_index):
    from anserini_ray.search import LocalSearcher

    idx, _ = bl_index
    s = LocalSearcher(idx)
    docids, scores = s.search_background_linking("news:0", k_terms=10, hits=5)
    # the query doc itself and its exact duplicate are removed (cosine 1.0)
    assert "news:0" not in docids
    assert "dup:0" not in docids
    # topically-related doc survives and ranks first
    assert docids[0] == "news:1"
    # rank scores are hits - idx of the merged list
    assert scores.tolist() == sorted(scores.tolist(), reverse=True)


def test_background_linking_exclusion(bl_index):
    from anserini_ray.search import LocalSearcher

    idx, _ = bl_index
    s = LocalSearcher(idx)
    base, _ = s.search_background_linking("news:0", k_terms=10, hits=5)
    assert "op:0" in base
    got, _ = s.search_background_linking(
        "news:0", k_terms=10, hits=5, exclude_docids={"op:0"}
    )
    assert "op:0" not in got  # kicker MUST_NOT analog


def test_background_linking_paragraph_round_robin(bl_index):
    from anserini_ray.search import LocalSearcher

    idx, texts = bl_index
    s = LocalSearcher(idx)

    def provider(docid):
        # two paragraphs with distinct vocabularies
        return (
            "solar panels renewable energy market\n\n"
            "baseball season dramatic inning game"
        )

    docids, scores = s.search_background_linking(
        "news:0", k_terms=10, hits=6, paragraph=True, text_provider=provider
    )
    assert "news:0" not in docids and "dup:0" not in docids
    # both topical clusters contribute results (round-robin interleave)
    assert "news:1" in docids and "other:0" in docids
    top2 = set(docids[:2])
    assert "other:0" in top2  # paragraph 2's top hit interleaves at the top

    with pytest.raises(ValueError):
        s.search_background_linking("news:0", paragraph=True)


def test_background_linking_weighted_runs(bl_index):
    from anserini_ray.search import LocalSearcher

    idx, _ = bl_index
    s = LocalSearcher(idx)
    d1, _ = s.search_background_linking("news:0", k_terms=5, hits=5,
                                        weighted=True)
    assert d1 and "news:0" not in d1

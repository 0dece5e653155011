"""LTR feature extraction sanity + hand-computed oracle checks."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anserini_ray.sources import generate_transcripts
from oracle import BruteForceIndex


@pytest.fixture(scope="module")
def ltr_setup(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index

    tmp = tmp_path_factory.mktemp("ltr")
    p = str(tmp / "c.parquet")
    table = generate_transcripts(600, seed=44)
    pq.write_table(table, p)
    idx = str(tmp / "idx")
    build_index(
        ray.data.read_parquet(p),
        idx,
        IndexConfig(seg_shift=8, store_docvecs=True, store_positions=True),
        input_files=[p],
    )
    docs = [
        (f"{c}:{t}", x)
        for c, t, x in zip(
            table["conv_id"].to_pylist(),
            table["turn_idx"].to_pylist(),
            table["text"].to_pylist(),
        )
    ]
    return idx, BruteForceIndex(docs)


def test_feature_values(ltr_setup):
    from anserini_ray.pipelines.ltr import FEATURE_NAMES, extract_features
    from anserini_ray.search import LocalSearcher

    idx, oracle = ltr_setup
    s = LocalSearcher(idx)
    query = "merge sort pipeline"
    docids, scores = s.search(query, k=5, adjust_ties=False)
    pairs = pa.table(
        {
            "qid": pa.array([1] * len(docids), type=pa.int32()),
            "query": [query] * len(docids),
            "doc_id": docids,
        }
    )
    feats = extract_features(idx, pairs).to_pandas()
    assert list(feats.columns) == ["qid", "doc_id"] + FEATURE_NAMES
    for _, row in feats.iterrows():
        docid = row["doc_id"]
        dv = {t: p[docid] for t, p in oracle.tf.items() if docid in p}
        qtoks = oracle.analyzer.analyze(query)
        assert row["doc_size"] == oracle.dl[docid]
        assert row["query_length"] == len(qtoks)
        assert row["matching_term_count"] == sum(
            1 for t in set(qtoks) if t in dv
        )
        assert row["unique_term_count"] == len(dv)
        assert row["sum_matching_tf"] == sum(
            dv.get(t, 0) for t in set(qtoks)
        )
        want_tfidf = sum(
            dv[t] * math.log(oracle.N / oracle.df(t))
            for t in set(qtoks)
            if t in dv
        )
        np.testing.assert_allclose(row["tfidf"], want_tfidf, rtol=1e-9)
    # bm25 feature equals the engine's own score for the pair
    engine_scores = dict(zip(docids, scores))
    for _, row in feats.iterrows():
        np.testing.assert_allclose(
            row["bm25"], engine_scores[row["doc_id"]], rtol=2e-6
        )


def test_pair_count_features(ltr_setup):
    from anserini_ray.pipelines.ltr import extract_features
    from anserini_ray.search import LocalSearcher

    idx, oracle = ltr_setup
    s = LocalSearcher(idx)
    # find a doc that actually contains an adjacent query bigram
    docids, _ = s.phrase_search("merge sort", k=3, adjust_ties=False)
    if not docids:
        pytest.skip("corpus has no 'merge sort' phrase")
    pairs = pa.table(
        {
            "qid": pa.array([1], type=pa.int32()),
            "query": ["merge sort"],
            "doc_id": [docids[0]],
        }
    )
    feats = extract_features(idx, pairs).to_pandas().iloc[0]
    assert feats["ordered_pairs"] >= 1
    assert feats["unordered_pairs"] >= feats["ordered_pairs"]

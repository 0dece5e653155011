"""End-to-end: build the inverted index with the Ray pipeline, verify index
stats + BM25 top-k rank/score identity against the independent brute-force
oracle (the analog of the reference's EndToEndTest golden runs)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from anserini_ray.sources import generate_transcripts
from oracle import BruteForceIndex

QUERIES = [
    ("1", "merge sort"),
    ("2", "hash join pipeline"),
    ("3", "window"),
    ("4", "the fast table scan"),
    ("5", "city buses running on schedule"),
    ("6", "query query plan"),          # duplicate token → additive clause
    ("7", "zq0007 zq0123"),             # rare terms
    ("8", "the of and to"),             # all stopwords → empty result
    ("9", "nosuchterm qqqq"),           # OOV
    ("10", "pipeline"),                  # hot term, many ties
]


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    from anserini_ray.index import IndexConfig, build_index

    tmp = tmp_path_factory.mktemp("idx")
    corpus_path = str(tmp / "corpus.parquet")
    table = generate_transcripts(1500, seed=7)
    pq.write_table(table, corpus_path)

    import ray.data

    ds = ray.data.read_parquet(corpus_path, columns=["conv_id", "turn_idx", "text"])
    index_dir = str(tmp / "index")
    config = IndexConfig(seg_shift=8)  # 256-doc segments → multi-segment
    manifest = build_index(ds, index_dir, config, input_files=[corpus_path])

    docs = [
        (f"{c}:{t}", x)
        for c, t, x in zip(
            table["conv_id"].to_pylist(),
            table["turn_idx"].to_pylist(),
            table["text"].to_pylist(),
        )
    ]
    oracle = BruteForceIndex(docs)
    return index_dir, manifest, oracle, table, corpus_path, config


def test_collection_stats(built_index):
    index_dir, manifest, oracle, table, *_ = built_index
    assert manifest.doc_count == oracle.N
    assert manifest.sum_total_tf == oracle.sum_dl
    assert manifest.counters["indexed"] == oracle.N
    assert manifest.counters["total_input"] == table.num_rows
    assert manifest.counters["empty"] == table.num_rows - oracle.N
    assert len(manifest.segments) > 1


def test_term_stats_match_oracle(built_index):
    index_dir, manifest, oracle, *_ = built_index
    from anserini_ray.search import LocalSearcher

    s = LocalSearcher(index_dir)
    # aggregate engine df/cf across segments
    eng_df: dict = {}
    eng_cf: dict = {}
    for r in s.readers:
        for term, df_, cf_ in r.iter_terms():
            eng_df[term] = eng_df.get(term, 0) + df_
            eng_cf[term] = eng_cf.get(term, 0) + cf_
    assert set(eng_df) == set(oracle.tf)
    for term in oracle.tf:
        assert eng_df[term] == oracle.df(term), term
        assert eng_cf[term] == oracle.cf(term), term
    # global stats sidecar agrees
    for r in s.readers:
        for term, gdf in r.global_df.items():
            assert gdf == oracle.df(term), term


@pytest.mark.parametrize("mode", ["lucene", "accurate"])
def test_topk_rank_and_score_identity(built_index, mode):
    index_dir, *_ , oracle, table, corpus_path, config = built_index
    from anserini_ray.search import LocalSearcher

    s = LocalSearcher(index_dir, mode=mode)
    for qid, qtext in QUERIES:
        docids, scores = s.search(qtext, k=50, adjust_ties=False)
        expected = oracle.search(qtext, k=50, mode=mode)
        assert docids == [d for d, _ in expected], f"q{qid} rank mismatch"
        got = np.array(scores, dtype=np.float32)
        want = np.array([sc for _, sc in expected], dtype=np.float32)
        assert np.array_equal(got, want), (
            f"q{qid} score mismatch: {got[:5]} vs {want[:5]}"
        )


def test_pruned_matches_exhaustive(built_index):
    index_dir, *_ = built_index
    from anserini_ray.search import LocalSearcher

    s0 = LocalSearcher(index_dir, prune=False)
    s1 = LocalSearcher(index_dir, prune=True)
    for qid, qtext in QUERIES:
        d0, sc0 = s0.search(qtext, k=25, adjust_ties=False)
        d1, sc1 = s1.search(qtext, k=25, adjust_ties=False)
        assert d0 == d1, f"q{qid}"
        np.testing.assert_allclose(sc0, sc1, rtol=1e-6)


def test_prune_auto_per_segment(built_index):
    """prune="auto" prunes only segments past PRUNE_AUTO_MIN_DOCS and is
    result-identical to both fixed modes either side of the threshold."""
    index_dir, *_ = built_index
    from anserini_ray.search import LocalSearcher

    s_off = LocalSearcher(index_dir, prune=False)
    s_auto = LocalSearcher(index_dir, prune="auto")
    # tiny segments: auto must choose the exhaustive kernel everywhere
    assert all(not s_auto._prune_for(r) for r in s_auto.readers)
    # force the threshold under the test segments: auto now prunes all
    s_auto.PRUNE_AUTO_MIN_DOCS = 1
    assert all(s_auto._prune_for(r) for r in s_auto.readers)
    for qid, qtext in QUERIES:
        d0, sc0 = s_off.search(qtext, k=25, adjust_ties=False)
        d1, sc1 = s_auto.search(qtext, k=25, adjust_ties=False)
        assert d0 == d1, f"q{qid}"
        np.testing.assert_allclose(sc0, sc1, rtol=1e-6)


def test_ties_adjust_and_trec_format(built_index):
    index_dir, *_ = built_index
    from anserini_ray.search import LocalSearcher
    from anserini_ray.search.ties import format_trec_run

    s = LocalSearcher(index_dir)
    docids, scores = s.search("pipeline", k=100)
    # adjusted scores must be strictly decreasing (that's the whole point)
    assert all(scores[i] > scores[i + 1] for i in range(len(scores) - 1))
    lines = format_trec_run("10", docids, scores)
    parts = lines[0].split()
    assert parts[1] == "Q0" and parts[3] == "1" and len(parts) == 6
    float(parts[4])


def test_searcher_facade_matches_local(built_index, ray_session):
    index_dir, *_ = built_index
    from anserini_ray.search import LocalSearcher, Searcher

    local = LocalSearcher(index_dir)
    served = Searcher(index_dir, num_actors=2)
    res = served.batch_search(QUERIES, k=20)
    for qid, qtext in QUERIES:
        d_l, s_l = local.search(qtext, k=20)
        d_s, s_s = res[qid]
        assert d_l == d_s, qid
        assert np.array_equal(np.asarray(s_l), np.asarray(s_s)), qid


def test_resume_skips_done_segments(built_index, ray_session):
    index_dir, manifest, oracle, table, corpus_path, config = built_index
    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.search import LocalSearcher
    from anserini_ray.state.manifest import completed_segments

    done_before = completed_segments(index_dir, manifest.fingerprint)
    assert done_before == {s["segment_id"] for s in manifest.segments}

    # drop one segment's manifest + files → resume must rebuild only it
    victim = manifest.segments[1]["segment_id"]
    os.unlink(os.path.join(index_dir, "manifests", f"seg-{victim:06d}.json"))
    import shutil

    shutil.rmtree(os.path.join(index_dir, "postings", f"segment_id={victim}"))
    shutil.rmtree(os.path.join(index_dir, "docmap", f"segment_id={victim}"))

    ds = ray.data.read_parquet(corpus_path, columns=["conv_id", "turn_idx", "text"])
    cfg = IndexConfig(seg_shift=config.seg_shift, resume=True)
    m2 = build_index(ds, index_dir, cfg, input_files=[corpus_path])
    assert m2.doc_count == manifest.doc_count
    assert m2.sum_total_tf == manifest.sum_total_tf

    s = LocalSearcher(index_dir)
    for qid, qtext in QUERIES[:5]:
        docids, scores = s.search(qtext, k=20, adjust_ties=False)
        expected = oracle.search(qtext, k=20)
        assert docids == [d for d, _ in expected], f"after resume q{qid}"


@pytest.mark.parametrize(
    "similarity", ["qld", "qljm", "inl2", "spl", "f2exp", "f2log"]
)
def test_similarity_family_matches_oracle(built_index, similarity):
    index_dir, *_ , oracle, table, corpus_path, config = built_index
    from anserini_ray.search import LocalSearcher

    s = LocalSearcher(index_dir, similarity=similarity)
    for qid, qtext in QUERIES[:6]:
        docids, scores = s.search(qtext, k=30, adjust_ties=False)
        expected = oracle.search_sim(qtext, similarity, k=30)
        assert docids == [d for d, _ in expected], f"{similarity} q{qid}"
        got = np.array(scores, dtype=np.float32)
        want = np.array([sc for _, sc in expected], dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


def test_resume_with_optional_artifacts(ray_session, tmp_path_factory):
    """Resume keeps docvecs/positions artifacts consistent too."""
    import shutil

    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.search import LocalSearcher

    tmp = tmp_path_factory.mktemp("resume_full")
    p = str(tmp / "c.parquet")
    table = generate_transcripts(800, seed=13)
    pq.write_table(table, p)
    idx = str(tmp / "idx")
    cfg = dict(seg_shift=8, store_docvecs=True, store_positions=True)
    ds = ray.data.read_parquet(p, columns=["conv_id", "turn_idx", "text"])
    m = build_index(ds, idx, IndexConfig(**cfg), input_files=[p])
    s0 = LocalSearcher(idx)
    before = s0.search_rm3("merge sort", k=15, adjust_ties=False)
    phrase_before = s0.phrase_search("merge sort", k=10, adjust_ties=False)

    victim = m.segments[1]["segment_id"]
    os.unlink(os.path.join(idx, "manifests", f"seg-{victim:06d}.json"))
    for sub in ("postings", "docmap", "docvecs"):
        shutil.rmtree(os.path.join(idx, sub, f"segment_id={victim}"))

    ds = ray.data.read_parquet(p, columns=["conv_id", "turn_idx", "text"])
    build_index(ds, idx, IndexConfig(**cfg, resume=True), input_files=[p])
    s1 = LocalSearcher(idx)
    after = s1.search_rm3("merge sort", k=15, adjust_ties=False)
    assert before[0] == after[0]
    assert np.array_equal(np.asarray(before[1]), np.asarray(after[1]))
    assert phrase_before[0] == s1.phrase_search("merge sort", k=10, adjust_ties=False)[0]


def test_lazy_identity_path_matches_eager(ray_session, tmp_path_factory, monkeypatch):
    """Round-5 lazy segment open: with the identity-laziness threshold
    forced to 0, every read goes through the row-group-lazy path — results,
    docid strings, forward lookups and document_by_field must be identical
    to the eager reader on the same index."""
    import pyarrow.parquet as pq_

    import ray.data

    import anserini_ray.search.segment_reader as SR
    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.search.searcher import LocalSearcher
    from anserini_ray.sources import generate_transcripts

    tmp = tmp_path_factory.mktemp("lazyid")
    p = str(tmp / "c.parquet")
    pq_.write_table(generate_transcripts(800, seed=77), p)
    idx = str(tmp / "idx")
    build_index(
        ray.data.read_parquet(p), idx,
        IndexConfig(seg_shift=8, store_docvecs=True), input_files=[p],
    )
    eager = LocalSearcher(idx)
    queries = ["merge sort pipeline", "stream batch", "zq0007"]
    want = {q: eager.search(q, k=25) for q in queries}
    probe_docid = want[queries[0]][0][0]
    want_doc = eager.document_by_field("turn_idx", 3)

    monkeypatch.setattr(SR, "IDENTITY_LAZY_MIN_DOCS", 0)
    lazy = LocalSearcher(idx)
    for r in lazy.readers:
        assert r._conv_id is None  # precondition: identity stayed lazy
    for q in queries:
        d, sc = lazy.search(q, k=25)
        assert d == want[q][0]
        assert np.allclose(np.asarray(sc), np.asarray(want[q][1]))
    assert lazy.document_by_field("turn_idx", 3) == want_doc
    assert lazy.doc_vector(probe_docid) == eager.doc_vector(probe_docid)

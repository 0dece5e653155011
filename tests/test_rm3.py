"""RM3 pseudo-relevance feedback vs an independent oracle implementation."""

import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from anserini_ray.sources import generate_transcripts
from oracle import BruteForceIndex

F = np.float32


def oracle_rm3(
    oracle: BruteForceIndex,
    query: str,
    k: int,
    fb_terms=10,
    fb_docs=10,
    oqw=0.5,
    cutoff=50,
):
    """Independent scalar RM3 (reference semantics, Rm3Reranker.java)."""
    qtoks = oracle.analyzer.analyze(query)
    qfv: dict[str, float] = {}
    for t in qtoks:
        qfv[t] = qfv.get(t, 0.0) + 1.0
    l1 = sum(qfv.values())
    qfv = {t: v / l1 for t, v in qfv.items()}

    first = oracle.search(query, k=cutoff)
    numdocs = min(fb_docs, len(first))
    alnum = re.compile(r"^[a-z0-9]+$")
    dvs, norms = [], []
    for docid, _ in first[:numdocs]:
        dv = {}
        for term, postings in oracle.tf.items():
            if docid not in postings:
                continue
            if len(term) < 2 or len(term) > 20 or not alnum.match(term):
                continue
            if oracle.df(term) / oracle.N > 0.1:
                continue
            dv[term] = float(postings[docid])
        # lexicographic insertion order (Lucene TermsEnum), then stable prune
        dv = dict(sorted(dv.items()))
        dv = dict(sorted(dv.items(), key=lambda kv: -kv[1])[:fb_terms])
        dvs.append(dv)
        norms.append(sum(dv.values()))
    vocab = sorted(set().union(*[set(d) for d in dvs]) if dvs else set())
    rm = {}
    for term in vocab:
        w = F(0)
        for i, dv in enumerate(dvs):
            if norms[i] > 0.001:
                w = F(w + (dv.get(term, 0.0) / norms[i]) * first[i][1])
        rm[term] = float(w)
    rm = dict(sorted(rm.items(), key=lambda kv: -kv[1])[:fb_terms])
    l1 = sum(rm.values())
    if l1 > 0:
        rm = {t: v / l1 for t, v in rm.items()}
    final_w = {}
    for t in set(qfv) | set(rm):
        final_w[t] = oqw * qfv.get(t, 0.0) + (1 - oqw) * rm.get(t, 0.0)

    # weighted BM25 scoring (float32, lucene norm mode)
    import math

    from anserini_ray.search.norms import byte4_to_int, int_to_byte4

    scores: dict[str, np.float32] = {}
    k1f, bf = F(0.9), F(0.4)
    for term, boost in final_w.items():
        postings = oracle.tf.get(term)
        if not postings:
            continue
        w = F(boost) * F(
            math.log(1 + (oracle.N - len(postings) + 0.5) / (len(postings) + 0.5))
        )
        for docid, tf in postings.items():
            dl = byte4_to_int(int_to_byte4(oracle.dl[docid]))
            norm = k1f * ((F(1) - bf) + bf * F(dl) / oracle.avgdl)
            contrib = w * F(float(tf) / (float(tf) + float(norm)))
            scores[docid] = scores.get(docid, F(0)) + contrib
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, float(s)) for d, s in ranked[:k]]


@pytest.fixture(scope="module")
def rm3_index(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index

    tmp = tmp_path_factory.mktemp("rm3")
    corpus_path = str(tmp / "corpus.parquet")
    table = generate_transcripts(1200, seed=21)
    pq.write_table(table, corpus_path)
    ds = ray.data.read_parquet(corpus_path, columns=["conv_id", "turn_idx", "text"])
    index_dir = str(tmp / "index")
    build_index(
        ds,
        index_dir,
        IndexConfig(seg_shift=8, store_docvecs=True),
        input_files=[corpus_path],
    )
    docs = [
        (f"{c}:{t}", x)
        for c, t, x in zip(
            table["conv_id"].to_pylist(),
            table["turn_idx"].to_pylist(),
            table["text"].to_pylist(),
        )
    ]
    return index_dir, BruteForceIndex(docs)


def test_doc_vector_roundtrip(rm3_index):
    from anserini_ray.search import LocalSearcher

    index_dir, oracle = rm3_index
    s = LocalSearcher(index_dir)
    docid = next(iter(oracle.dl))
    dv = s.doc_vector(docid)
    expected = {
        t: p[docid] for t, p in oracle.tf.items() if docid in p
    }
    assert dv == dict(sorted(expected.items()))


def test_rm3_matches_oracle(rm3_index):
    from anserini_ray.search import LocalSearcher

    index_dir, oracle = rm3_index
    s = LocalSearcher(index_dir)
    for q in ["merge sort", "hash join pipeline", "window stream"]:
        docids, scores = s.search_rm3(q, k=20, adjust_ties=False)
        expected = oracle_rm3(oracle, q, k=20)
        assert docids == [d for d, _ in expected], q
        got = np.asarray(scores, dtype=np.float32)
        want = np.asarray([sc for _, sc in expected], dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-7)


def test_rm3_changes_ranking_vs_plain(rm3_index):
    from anserini_ray.search import LocalSearcher

    index_dir, _ = rm3_index
    s = LocalSearcher(index_dir)
    d0, _ = s.search("merge sort", k=20, adjust_ties=False)
    d1, _ = s.search_rm3("merge sort", k=20, adjust_ties=False)
    assert d0 != d1  # feedback actually did something

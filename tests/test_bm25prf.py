"""BM25PRF query expansion vs an independent oracle implementation."""

import math
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from anserini_ray.sources import generate_transcripts
from oracle import BruteForceIndex

F = np.float32


def oracle_bm25prf(
    oracle: BruteForceIndex,
    query: str,
    k: int,
    fb_terms=20,
    fb_docs=10,
    k1=0.9,
    b=0.4,
    new_term_weight=0.2,
    cutoff=50,
):
    orig_terms = oracle.analyzer.analyze(query)
    first = oracle.search(query, k=cutoff)
    numrel = min(fb_docs, len(first))
    N = oracle.N
    term_sets = []
    for docid, _ in first[:numrel]:
        term_sets.append(
            {t for t, p in oracle.tf.items() if docid in p}
        )
    vocab = set().union(*term_sets) if term_sets else set()
    alnum = re.compile(r"^[a-z0-9]+$")
    digits = re.compile(r"^[0-9]+$")

    def rel_w(df, df_rel, mult):
        rw = (
            math.log(
                (df_rel + 0.5)
                * (N - df - numrel + df_rel + 0.5)
                / ((df - df_rel + 0.5) * (numrel - df_rel + 0.5))
            )
            * mult
        )
        return max(rw, 1e-6)

    def offer_w(df, df_rel, mult):
        return rel_w(df, df_rel, mult) * math.log(max(df_rel, 1e-6))

    orig_set = set(orig_terms)
    new_feats = {}
    for term in sorted(vocab):
        if term in orig_set:
            continue
        if len(term) < 2 or len(term) > 20:
            continue
        if not alnum.match(term) or digits.match(term):
            continue
        df = oracle.df(term)
        df_rel = sum(1 for ts in term_sets if term in ts)
        if df_rel < 2:
            continue
        new_feats[term] = (df, df_rel, new_term_weight)
    pruned = dict(
        sorted(new_feats.items(), key=lambda kv: (-offer_w(*kv[1]), kv[0]))[
            :fb_terms
        ]
    )
    for term in orig_terms:
        df = oracle.df(term)
        df_rel = sum(1 for ts in term_sets if term in ts)
        pruned[term] = (df, df_rel, 1.0)

    # second pass: BM25 with idf == 1 (BM25PrfSimilarity)
    from anserini_ray.search.norms import byte4_to_int, int_to_byte4

    k1f, bf = F(k1), F(b)
    scores = {}
    for term, feat in pruned.items():
        boost = F(rel_w(*feat))
        postings = oracle.tf.get(term)
        if not postings:
            continue
        for docid, tf in postings.items():
            dl = byte4_to_int(int_to_byte4(oracle.dl[docid]))
            norm = k1f * ((F(1) - bf) + bf * F(dl) / oracle.avgdl)
            contrib = boost * F(float(tf) / (float(tf) + float(norm)))
            scores[docid] = scores.get(docid, F(0)) + contrib
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, float(s)) for d, s in ranked[:k]]


@pytest.fixture(scope="module")
def prf_index(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index

    tmp = tmp_path_factory.mktemp("prf")
    corpus_path = str(tmp / "corpus.parquet")
    table = generate_transcripts(1000, seed=33)
    pq.write_table(table, corpus_path)
    ds = ray.data.read_parquet(corpus_path, columns=["conv_id", "turn_idx", "text"])
    index_dir = str(tmp / "index")
    build_index(
        ds, index_dir, IndexConfig(seg_shift=8, store_docvecs=True),
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


def test_bm25prf_matches_oracle(prf_index):
    from anserini_ray.search import LocalSearcher

    index_dir, oracle = prf_index
    s = LocalSearcher(index_dir)
    for q in ["merge sort", "hash join pipeline", "window stream"]:
        docids, scores = s.search_bm25prf(q, k=20, adjust_ties=False)
        expected = oracle_bm25prf(oracle, q, k=20)
        # contribution-ordering differs (engine sums clause-major per
        # segment, oracle per posting) -> compare ranks + close scores
        assert docids == [d for d, _ in expected], q
        np.testing.assert_allclose(
            np.asarray(scores, dtype=np.float32),
            np.asarray([sc for _, sc in expected], dtype=np.float32),
            rtol=2e-6,
            atol=2e-7,
        )

"""SDM vs an independent scalar oracle implementing the documented Lucene
span semantics (NearSpansOrdered lag-pointer matching with slop 1,
NearSpansUnordered advance-the-minimum with slop 8, sloppyFreq = 1/(1+width),
SpanWeight idf = sum of the pair's term idfs)."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from anserini_ray.sources import generate_transcripts
from oracle import BruteForceIndex

F = np.float32


def oracle_sdm(
    oracle: BruteForceIndex, query: str, k: int,
    w_t=0.85, w_o=0.1, w_u=0.05, window=8,
):
    from anserini_ray.search.norms import byte4_to_int, int_to_byte4

    terms = oracle.analyzer.analyze(query)
    # per-doc positions from re-analysis (independent of the index)
    pos_by_doc: dict[str, dict[str, list[int]]] = {}
    for docid, text in oracle.texts.items():
        toks, poss = oracle.analyzer.analyze_with_positions(text)
        m: dict[str, list[int]] = {}
        for t, p in zip(toks, poss):
            m.setdefault(t, []).append(p)
        pos_by_doc[docid] = m

    pairs = list(zip(terms, terms[1:]))
    ord_counts: dict[tuple, dict[str, np.float32]] = {p: {} for p in pairs}
    unord_counts: dict[tuple, dict[str, np.float32]] = {p: {} for p in pairs}
    import bisect

    for pair in pairs:
        t1, t2 = pair
        for docid, m in pos_by_doc.items():
            p1, p2 = m.get(t1), m.get(t2)
            if not p1 or not p2:
                continue
            # ordered span matches: first t2 >= i+1 per t1 occurrence
            fo = F(0)
            for i in p1:
                ix = bisect.bisect_left(p2, i + 1)
                if ix < len(p2):
                    w = p2[ix] - i - 1
                    if w <= 1:
                        fo = F(fo + F(1.0 / (1 + w)))
            # unordered: two-pointer advance-min states
            fu = F(0)
            x = y = 0
            while True:
                i, j = p1[x], p2[y]
                d = abs(i - j)
                if d - 1 <= window:
                    fu = F(fu + F(1.0 / (1 + d)))
                if i <= j:
                    x += 1
                    if x >= len(p1):
                        break
                else:
                    y += 1
                    if y >= len(p2):
                        break
            if fo > 0:
                ord_counts[pair][docid] = fo
            if fu > 0:
                unord_counts[pair][docid] = fu

    N, avgdl = oracle.N, oracle.avgdl
    k1f, bf = F(0.9), F(0.4)
    counts: dict[str, int] = {}
    for t in terms:
        counts[t] = counts.get(t, 0) + 1

    scores: dict[str, np.float32] = {}

    def add(docid, w, tf):
        dl = byte4_to_int(int_to_byte4(oracle.dl[docid]))
        norm = k1f * ((F(1) - bf) + bf * F(dl) / avgdl)
        scores[docid] = scores.get(docid, F(0)) + w * F(
            float(tf) / (float(tf) + float(norm))
        )

    for t, cnt in counts.items():
        postings = oracle.tf.get(t)
        if not postings:
            continue
        w = F(w_t) * F(cnt) * F(
            math.log(1 + (N - len(postings) + 0.5) / (len(postings) + 0.5))
        )
        for docid, tf in postings.items():
            add(docid, w, tf)
    def term_idf(t):
        df = len(oracle.tf.get(t, {}))
        return F(math.log(1 + (N - df + 0.5) / (df + 0.5)))

    for pair in pairs:
        t1, t2 = pair
        if not oracle.tf.get(t1) or not oracle.tf.get(t2):
            continue
        pair_idf = term_idf(t1) + term_idf(t2)  # SpanWeight sums term idfs
        for weight, cmap in ((w_o, ord_counts[pair]), (w_u, unord_counts[pair])):
            w = F(weight) * pair_idf
            for docid, tf in cmap.items():
                add(docid, w, tf)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, float(s)) for d, s in ranked[:k]]


@pytest.fixture(scope="module")
def sdm_setup(ray_session, tmp_path_factory):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index

    tmp = tmp_path_factory.mktemp("sdm")
    p = str(tmp / "c.parquet")
    table = generate_transcripts(800, seed=55)
    pq.write_table(table, p)
    idx = str(tmp / "idx")
    build_index(
        ray.data.read_parquet(p), idx,
        IndexConfig(seg_shift=8, store_positions=True), input_files=[p],
    )
    docs = [
        (f"{c}:{t}", x)
        for c, t, x in zip(
            table["conv_id"].to_pylist(),
            table["turn_idx"].to_pylist(),
            table["text"].to_pylist(),
        )
    ]
    oracle = BruteForceIndex(docs)
    oracle.texts = {
        f"{c}:{t}": x
        for c, t, x in zip(
            table["conv_id"].to_pylist(),
            table["turn_idx"].to_pylist(),
            table["text"].to_pylist(),
        )
        if x and x.strip()
    }
    return idx, oracle


def test_sdm_matches_oracle(sdm_setup):
    from anserini_ray.search import LocalSearcher

    idx, oracle = sdm_setup
    s = LocalSearcher(idx)
    for q in ["merge sort", "hash join pipeline", "data value agent"]:
        docids, scores = s.search_sdm(q, k=20, adjust_ties=False)
        expected = oracle_sdm(oracle, q, k=20)
        assert docids == [d for d, _ in expected], q
        np.testing.assert_allclose(
            np.asarray(scores, dtype=np.float32),
            np.asarray([sc for _, sc in expected], dtype=np.float32),
            rtol=2e-6, atol=2e-7,
        )


def test_sdm_single_term_falls_back(sdm_setup):
    from anserini_ray.search import LocalSearcher

    idx, _ = sdm_setup
    s = LocalSearcher(idx)
    d0, s0 = s.search("pipeline", k=10, adjust_ties=False)
    d1, s1 = s.search_sdm("pipeline", k=10, adjust_ties=False)
    assert d0 == d1 and np.array_equal(np.asarray(s0), np.asarray(s1))

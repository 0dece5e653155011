"""Independent brute-force BM25 oracle (reference-parity semantics, SURVEY
§7.0) — plain Python dicts + float32 scalar math, no shared code with the
engine's index/search path (only the analyzer is shared, which is itself
golden-tested against the reference fixtures).

The analog of the reference's hard-coded golden TREC lines
(`T/integration/TrecEndToEndTest.java:79-124`).
"""

from __future__ import annotations

import math

import numpy as np

from anserini_ray.analysis import make_analyzer
from anserini_ray.search.norms import byte4_to_int, int_to_byte4

F = np.float32


class BruteForceIndex:
    def __init__(self, docs: list[tuple[str, str]], analyzer_config=None):
        """docs: [(doc_id, text)] — whitespace-empty texts are excluded from
        the collection (EmptyDocumentException parity)."""
        self.analyzer = make_analyzer(analyzer_config)
        self.tf: dict[str, dict[str, int]] = {}
        self.dl: dict[str, int] = {}
        for doc_id, text in docs:
            if not text or not text.strip():
                continue
            toks = self.analyzer.analyze(text)
            self.dl[doc_id] = len(toks)
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t, c in counts.items():
                self.tf.setdefault(t, {})[doc_id] = c
        self.N = len(self.dl)
        self.sum_dl = sum(self.dl.values())
        self.avgdl = F(self.sum_dl / max(1, self.N))

    def df(self, term: str) -> int:
        return len(self.tf.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.tf.get(term, {}).values())

    def search(
        self, query: str, k: int = 1000, k1: float = 0.9, b: float = 0.4,
        mode: str = "lucene",
    ) -> list[tuple[str, float]]:
        tokens = self.analyzer.analyze(query)
        clauses: dict[str, int] = {}
        for t in tokens:
            clauses[t] = clauses.get(t, 0) + 1
        k1f, bf = F(k1), F(b)
        scores: dict[str, np.float32] = {}
        for term, cnt in clauses.items():
            postings = self.tf.get(term)
            if not postings:
                continue
            w = F(cnt) * F(math.log(1 + (self.N - len(postings) + 0.5) / (len(postings) + 0.5)))
            for doc_id, tf in postings.items():
                dl = self.dl[doc_id]
                if mode == "lucene":
                    dl = byte4_to_int(int_to_byte4(dl))
                    norm = k1f * ((F(1) - bf) + bf * F(dl) / self.avgdl)
                    contrib = w * F(float(tf) / (float(tf) + float(norm)))
                else:
                    wf = w * F(tf)
                    denom = F(tf) + k1f * (F(1) - bf) + (k1f * bf / max(F(1e-10), self.avgdl)) * F(dl)
                    contrib = wf / denom
                scores[doc_id] = scores.get(doc_id, F(0)) + contrib
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]


    def search_sim(
        self, query: str, similarity: str, k: int = 1000, mode: str = "lucene",
        **params,
    ) -> list[tuple[str, float]]:
        """Scalar-math oracle for the non-BM25 similarity family (same
        published formulas, independent implementation)."""
        import math as m

        tokens = self.analyzer.analyze(query)
        clauses: dict[str, int] = {}
        for t in tokens:
            clauses[t] = clauses.get(t, 0) + 1
        N, sum_tf = self.N, self.sum_dl
        avgdl = float(self.avgdl)
        scores: dict[str, np.float32] = {}
        for term, cnt in clauses.items():
            postings = self.tf.get(term)
            if not postings:
                continue
            gdf = len(postings)
            gcf = sum(postings.values())
            for doc_id, tf in postings.items():
                dl = self.dl[doc_id]
                if mode == "lucene":
                    dl = byte4_to_int(int_to_byte4(dl))
                dlf = max(float(dl), 1.0) if similarity in ("qljm",) else float(dl)
                if similarity == "qld":
                    mu = params.get("mu", 1000.0)
                    p_c = (gcf + 1.0) / (sum_tf + 1.0)
                    s = m.log(1 + tf / (mu * p_c)) + m.log(mu / (dl + mu))
                    s = max(s, 0.0)
                elif similarity == "qljm":
                    lam = params.get("lam", 0.1)
                    p_c = (gcf + 1.0) / (sum_tf + 1.0)
                    s = max(m.log(1 + ((1 - lam) * tf / dlf) / (lam * p_c)), 0.0)
                elif similarity == "inl2":
                    c = params.get("c", 0.1)
                    tfn = tf * m.log2(1 + c * avgdl / max(float(dl), 1.0))
                    s = max(tfn / (tfn + 1.0) * m.log2((N + 1.0) / (gdf + 0.5)), 0.0)
                elif similarity == "spl":
                    c = params.get("c", 0.1)
                    lam = (gdf + 1.0) / (N + 1.0)
                    tfn = tf * m.log2(1 + c * avgdl / max(float(dl), 1.0))
                    frac = tfn / (tfn + 1.0)
                    if lam >= 1.0:
                        s = max(-m.log(max(1.0 - frac, 1e-12)), 0.0)
                    else:
                        s = max(-m.log(max((lam ** frac - lam) / (1 - lam), 1e-12)), 0.0)
                elif similarity == "f2exp":
                    s_, kk = params.get("s", 0.5), params.get("k", 0.35)
                    s = tf / (tf + s_ + s_ * dl / avgdl) * ((N + 1.0) / gdf) ** kk
                elif similarity == "f2log":
                    s_ = params.get("s", 0.5)
                    s = tf / (tf + s_ + s_ * dl / avgdl) * m.log((N + 1.0) / gdf)
                else:
                    raise ValueError(similarity)
                contrib = F(cnt * s)
                scores[doc_id] = scores.get(doc_id, F(0)) + contrib
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

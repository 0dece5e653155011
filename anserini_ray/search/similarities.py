"""The similarity family beyond BM25 — query-time scorer swaps mirroring the
reference's grid (`J/search/SearchCollection.java:281-334`):

- QL Dirichlet (mu=1000, `SearchCollection.java:298-302`)
- QL Jelinek-Mercer (lambda=0.1, `:303-307`)
- DFR InL2 (c=0.1, `:308-313`)
- IB SPL-D-L2 (c=0.1, `:314-319`)
- Axiomatic F2EXP / F2LOG (s=0.5, `:320-327`)

Formulas follow the published Lucene semantics (LMDirichletSimilarity with
the +1-smoothed DefaultCollectionModel, NormalizationH2 tfn, LambdaDF, the
axiomatic F2 family). Scores are computed in float64 and cast to float32 per
clause. Unlike BM25 (bit-level Lucene parity, `bm25.py`), parity here is
formula-level; each scorer is verified against the independent brute-force
oracle implementing the same published formula.

All scorers share one interface:
    term_scorer(count, gdf, gcf, stats) -> fn(tfs int array, dl float32
    array) -> float32 contributions (already multiplied by clause count).
`stats` carries N (docCount), sum_tf (sumTotalTermFreq), avgdl (float32).
Doc length `dl` is the norm-mode-resolved length (byte4-quantized in
"lucene" mode, exact in "accurate"), identical to the BM25 path.
"""

from __future__ import annotations

import numpy as np

F = np.float32
_LOG2 = np.log(2.0)


class CollectionStats:
    def __init__(self, doc_count: int, sum_total_tf: int):
        self.N = doc_count
        self.sum_tf = sum_total_tf
        self.avgdl = F(sum_total_tf / max(1, doc_count))


class Similarity:
    name = "base"

    def term_scorer(self, count: int, gdf: int, gcf: int, stats: CollectionStats):
        raise NotImplementedError


class QLDirichlet(Similarity):
    """LMDirichletSimilarity: boost * (log(1 + tf/(mu*p_c)) +
    log(mu/(dl+mu))), clamped at 0; p_c = (cf+1)/(sumTotalTermFreq+1)."""

    name = "qld"

    def __init__(self, mu: float = 1000.0):
        self.mu = mu

    def term_scorer(self, count, gdf, gcf, stats):
        mu = self.mu
        p_c = (gcf + 1.0) / (stats.sum_tf + 1.0)

        def score(tfs, dl):
            s = np.log1p(tfs.astype(np.float64) / (mu * p_c)) + np.log(
                mu / (dl.astype(np.float64) + mu)
            )
            return (count * np.maximum(s, 0.0)).astype(np.float32)

        return score


class QLJelinekMercer(Similarity):
    """LMJelinekMercerSimilarity: boost * log(1 + ((1-l)*tf/dl)/(l*p_c)),
    clamped at 0."""

    name = "qljm"

    def __init__(self, lam: float = 0.1):
        self.lam = lam

    def term_scorer(self, count, gdf, gcf, stats):
        lam = self.lam
        p_c = (gcf + 1.0) / (stats.sum_tf + 1.0)

        def score(tfs, dl):
            dl64 = np.maximum(dl.astype(np.float64), 1.0)
            s = np.log1p(
                ((1 - lam) * tfs.astype(np.float64) / dl64) / (lam * p_c)
            )
            return (count * np.maximum(s, 0.0)).astype(np.float32)

        return score


def _tfn_h2(tfs, dl, avgdl, c):
    """NormalizationH2: tfn = tf * log2(1 + c * avgdl / dl)."""
    dl64 = np.maximum(dl.astype(np.float64), 1.0)
    return tfs.astype(np.float64) * np.log1p(c * float(avgdl) / dl64) / _LOG2


class DfrInL2(Similarity):
    """DFR I(n)L2: tfn/(tfn+1) * log2((N+1)/(df+0.5))."""

    name = "inl2"

    def __init__(self, c: float = 0.1):
        self.c = c

    def term_scorer(self, count, gdf, gcf, stats):
        c = self.c
        avgdl = stats.avgdl
        idf = np.log((stats.N + 1.0) / (gdf + 0.5)) / _LOG2

        def score(tfs, dl):
            tfn = _tfn_h2(tfs, dl, avgdl, c)
            s = tfn / (tfn + 1.0) * idf
            return (count * np.maximum(s, 0.0)).astype(np.float32)

        return score


class IbSpl(Similarity):
    """IB with Smoothed Power-Law distribution, LambdaDF, NormalizationH2:
    -log((lambda^(tfn/(tfn+1)) - lambda)/(1 - lambda)),
    lambda = (df+1)/(N+1)."""

    name = "spl"

    def __init__(self, c: float = 0.1):
        self.c = c

    def term_scorer(self, count, gdf, gcf, stats):
        c = self.c
        avgdl = stats.avgdl
        lam = (gdf + 1.0) / (stats.N + 1.0)

        def score(tfs, dl):
            tfn = _tfn_h2(tfs, dl, avgdl, c)
            frac = tfn / (tfn + 1.0)
            if lam >= 1.0:
                # df == N makes the closed form 0/0; Lucene's observed output
                # (reference golden TrecEndToEndTest spl run) equals the
                # lambda->1 limit: -log(1 - tfn/(tfn+1))
                s = -np.log(np.maximum(1.0 - frac, 1e-12))
            else:
                val = (np.power(lam, frac) - lam) / (1.0 - lam)
                s = -np.log(np.maximum(val, 1e-12))
            return (count * np.maximum(s, 0.0)).astype(np.float32)

        return score


class AxiomaticF2Exp(Similarity):
    """F2EXP: tf/(tf + s + s*dl/avgdl) * ((N+1)/df)^k, k=0.35."""

    name = "f2exp"

    def __init__(self, s: float = 0.5, k: float = 0.35):
        self.s = s
        self.k = k

    def term_scorer(self, count, gdf, gcf, stats):
        s_, k = self.s, self.k
        avgdl = float(stats.avgdl)
        idf = ((stats.N + 1.0) / gdf) ** k

        def score(tfs, dl):
            tf64 = tfs.astype(np.float64)
            sc = tf64 / (tf64 + s_ + s_ * dl.astype(np.float64) / avgdl) * idf
            return (count * sc).astype(np.float32)

        return score


class AxiomaticF2Log(Similarity):
    """F2LOG: tf/(tf + s + s*dl/avgdl) * ln((N+1)/df)."""

    name = "f2log"

    def __init__(self, s: float = 0.5):
        self.s = s

    def term_scorer(self, count, gdf, gcf, stats):
        s_ = self.s
        avgdl = float(stats.avgdl)

        def score(tfs, dl):
            tf64 = tfs.astype(np.float64)
            idf = np.log((stats.N + 1.0) / gdf)
            sc = tf64 / (tf64 + s_ + s_ * dl.astype(np.float64) / avgdl) * idf
            return (count * sc).astype(np.float32)

        return score


class ClassicTfIdf(Similarity):
    """Lucene ClassicSimilarity (TF-IDF) as used by the reference's
    fake-words ANN search (`ApproximateNearestNeighborSearch.java:140`):
    sqrt(tf) * idf^2 / sqrt(dl), idf = 1 + ln(N/(df+1)). Formula-level
    parity (norm quantization follows the engine's norm mode, not classic's
    byte315 table)."""

    name = "classic"

    def term_scorer(self, count, gdf, gcf, stats):
        idf = 1.0 + np.log(stats.N / (gdf + 1.0))

        def score(tfs, dl):
            dl64 = np.maximum(dl.astype(np.float64), 1.0)
            s = np.sqrt(tfs.astype(np.float64)) * idf * idf / np.sqrt(dl64)
            return (count * s).astype(np.float32)

        return score


class SlrDotProduct(Similarity):
    """SLR sparse dot product (reference `SLRSimilarity.java:90-103`,
    README.md:118-133): score = query_activation * tf / 10^precision, where
    tf stores trunc(doc_activation * 10^precision). Collection stats are
    irrelevant by design; the clause `count` carries the float query
    activation."""

    name = "slr"

    def __init__(self, precision: int = 2):
        self.divider = float(10 ** precision)

    def term_scorer(self, count, gdf, gcf, stats):
        q = float(count)
        div = self.divider

        def score(tfs, dl):
            return (q * tfs.astype(np.float64) / div).astype(np.float32)

        return score


_REGISTRY = {
    "qld": QLDirichlet,
    "qljm": QLJelinekMercer,
    "inl2": DfrInL2,
    "spl": IbSpl,
    "f2exp": AxiomaticF2Exp,
    "f2log": AxiomaticF2Log,
    "classic": ClassicTfIdf,
    "slr": SlrDotProduct,
}


def make_similarity(name: str, **params) -> Similarity:
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown similarity {name!r}; one of bm25|{'|'.join(_REGISTRY)}"
        )
    return _REGISTRY[name](**params)

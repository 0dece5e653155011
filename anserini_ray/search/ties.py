"""Score ties adjustment — exact port of the reference
`ScoreTiesAdjusterReranker.java:29-76` semantics.

Round every score to 1e-4 (Java `Math.round(score * 1e4f) / 1e4f`, i.e.
floor(x*1e4 + 0.5) in float32), then subtract dup*1e-6 for each successive
tie, where "tie" means the previous (already adjusted) score minus this score
is <= 1e-4. All arithmetic in float32, like the reference.
"""

from __future__ import annotations

import numpy as np

_F = np.float32
_E4 = _F(1e4)
_TOL = _F(1e-4)
_EPS = _F(1e-6)


def adjust_score_ties(scores: np.ndarray) -> np.ndarray:
    """scores: rank-ordered (descending) float32 scores. Returns adjusted
    float32 scores preserving the exact sort order unambiguously."""
    out = np.asarray(scores, dtype=np.float32).copy()
    dup = 0
    for i in range(out.size):
        # Java Math.round(float) == floor(x + 0.5) as long
        out[i] = _F(np.floor(out[i] * _E4 + _F(0.5))) / _E4
        if i == 0 or out[i - 1] - out[i] > _TOL:
            dup = 0
        else:
            dup += 1
            out[i] = out[i] - _EPS * _F(dup)
    return out


def format_trec_run(
    qid, docids, scores, runtag: str = "AnseriniRay"
) -> list[str]:
    """Six-column TREC run lines (`SearchCollection.java:181-192`)."""
    return [
        f"{qid} Q0 {d} {r + 1} {s:.6f} {runtag}"
        for r, (d, s) in enumerate(zip(docids, scores))
    ]

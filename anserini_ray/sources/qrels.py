"""TREC qrels reader — reference `J/util/Qrels.java:30-52`: whitespace-split
lines `qid  _  docno  grade` (fields 0, 2, 3); later lines overwrite earlier
(qid, docno) entries (HashMap.put semantics).

Exposed as an Arrow table (qid, doc_id, grade) so the qrels⋈run /
qrels⋈features joins are Dataset ops, plus dict-style helpers mirroring
`isDocJudged` / `getRelevanceGrade` (Qrels.java:60-87).
"""

from __future__ import annotations

import re

import pyarrow as pa

_WS = re.compile(r"[\s\t]+")


def parse_qrels_lines(lines) -> pa.Table:
    seen: dict[tuple[str, str], int] = {}
    order: list[tuple[str, str]] = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        arr = _WS.split(line)
        if len(arr) < 4:
            continue
        key = (arr[0], arr[2])
        if key not in seen:
            order.append(key)
        seen[key] = int(arr[3])
    return pa.table(
        {
            "qid": pa.array([k[0] for k in order], type=pa.string()),
            "doc_id": pa.array([k[1] for k in order], type=pa.string()),
            "grade": pa.array([seen[k] for k in order], type=pa.int32()),
        }
    )


def read_qrels(path: str) -> pa.Table:
    with open(path, encoding="utf-8") as f:
        return parse_qrels_lines(f)


class Qrels:
    """Dict-view over a qrels table (reference Qrels.java API)."""

    def __init__(self, table: pa.Table):
        self._map: dict[str, dict[str, int]] = {}
        for qid, did, g in zip(
            table["qid"].to_pylist(),
            table["doc_id"].to_pylist(),
            table["grade"].to_pylist(),
        ):
            self._map.setdefault(qid, {})[did] = int(g)

    @classmethod
    def from_file(cls, path: str) -> "Qrels":
        return cls(read_qrels(path))

    def is_doc_judged(self, qid: str, docid: str) -> bool:
        return docid in self._map.get(qid, {})

    def relevance_grade(self, qid: str, docid: str) -> int:
        g = self._map.get(qid, {}).get(docid, 0)
        return g if g > 0 else 0  # reference clamps negatives to 0

    def qids(self):
        return self._map.keys()

    def doc_map(self, qid: str) -> dict[str, int]:
        return self._map.get(qid, {})

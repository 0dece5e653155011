"""TREC run file IO — the reference's run writer + `-skipexists` resume
(`J/search/SearchCollection.java:168-199, 438-441`)."""

from __future__ import annotations

import os


def write_run_file(path: str, lines: list[str]) -> str:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for line in lines:
            f.write(line + "\n")
    os.replace(tmp, path)
    return path


def run_exists(path: str) -> bool:
    return os.path.isfile(path) and os.path.getsize(path) > 0


def read_run_file(path: str) -> list[tuple[str, str, int, float]]:
    """-> [(qid, docid, rank, score)]"""
    out = []
    with open(path) as f:
        for line in f:
            qid, _, docid, rank, score, _ = line.split()
            out.append((qid, docid, int(rank), float(score)))
    return out

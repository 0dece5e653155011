"""ACL Anthology collection parser — reference `AclAnthology.java:110-167`:
YAML map of paper-id -> metadata under papers/; contents =
`<title> <abstract_html>` (missing fields -> "")."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA


def parse_acl_yaml(text: str) -> list[tuple[str, str]]:
    import yaml

    data = yaml.safe_load(text) or {}
    out = []
    for pid, paper in data.items():
        paper = paper or {}
        title = str(paper.get("title", "") or "")
        abstract = str(paper.get("abstract_html", "") or "")
        out.append((str(pid), f"{title} {abstract}"))
    return out


def read_acl_anthology(path: str):
    """`path` is the collection root (papers under papers/*.yaml, like the
    reference's DocumentCollection discovery)."""
    import ray.data

    papers_dir = os.path.join(path, "papers")
    root = papers_dir if os.path.isdir(papers_dir) else path
    files = [
        os.path.join(root, x)
        for x in sorted(os.listdir(root))
        if x.endswith((".yaml", ".yml"))
    ]

    def parse_one(row) -> list[dict]:
        with open(row["path"], errors="replace") as f:
            return [
                {"conv_id": d, "text": c} for d, c in parse_acl_yaml(f.read())
            ]

    ds = ray.data.from_items([{"path": f} for f in files]).flat_map(parse_one)

    def to_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch["conv_id"],
                pa.array(np.zeros(n, dtype=np.int32)),
                pa.array(["doc"] * n),
                batch["text"],
                pa.array([""] * n),
                pa.array(np.zeros(n, dtype=np.int64), type=pa.timestamp("us")),
            ],
            schema=TRANSCRIPT_SCHEMA,
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")

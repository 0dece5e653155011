"""Washington Post collection parser — reference
`WashingtonPostCollection.java:140-168`: JSONL articles; contents = title +
per-content-object lines: tag-stripped content for types sanitized_html /
tweet, verbatim for kicker, plus any fullCaption. The title-typed content
object is skipped (the top-level title field supplies it)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA
from .trec_collection import _strip_tags

_CONTENT_TYPE_TAG = ("sanitized_html", "tweet")


def wapo_contents(obj: dict) -> str:
    parts: list[str] = []
    title = obj.get("title")
    if title is not None:
        parts.append(str(title))
    for c in obj.get("contents") or []:
        if not isinstance(c, dict):
            continue
        ctype = c.get("type")
        content = c.get("content")
        if ctype is not None and content is not None:
            if ctype in _CONTENT_TYPE_TAG:
                parts.append(_strip_tags(str(content)))
            elif str(ctype).lower() == "kicker":
                parts.append(str(content))
        if c.get("fullcaption") is not None:
            parts.append(_strip_tags(str(c["fullcaption"])))
    return "".join(p + "\n" for p in parts)


def parse_wapo(lines) -> list[tuple[str, str, str]]:
    """-> [(id, contents, raw_json_line)]"""
    out = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "id" not in obj:
            continue
        out.append((str(obj["id"]), wapo_contents(obj), line))
    return out


def read_wapo_collection(path: str):
    import ray.data

    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files.extend(os.path.join(root, x) for x in sorted(names))
    else:
        files = [path]

    def parse_one(row):
        with open(row["path"], errors="replace") as f:
            return [{"conv_id": d, "text": c} for d, c, _ in parse_wapo(f)]

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

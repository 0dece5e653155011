"""CORE collection parser — reference `CoreCollection.java:118-140`:
concatenated/pretty-printed JSON objects (optionally .xz); id = doi if
present else coreId; contents = `<title> <abstract>` (nulls -> "")."""

from __future__ import annotations

import json
import lzma

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA


def _read_text(path: str) -> str:
    if path.endswith(".xz"):
        try:
            with lzma.open(path, "rt", errors="replace") as f:
                return f.read()
        except lzma.LZMAError:
            pass  # fixture quirk: plain JSON misnamed .xz
    with open(path, errors="replace") as f:
        return f.read()


def parse_core(text: str) -> list[tuple[str, str]]:
    out = []
    dec = json.JSONDecoder()
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i] not in "{[":
            i += 1
        if i >= n:
            break
        obj, end = dec.raw_decode(text, i)
        i = end
        objs = obj if isinstance(obj, list) else [obj]
        for o in objs:
            def val(k):
                v = o.get(k)
                return "" if v is None else str(v)

            doc_id = val("doi") or val("coreId")
            contents = val("title") + " " + val("abstract")
            out.append((doc_id, contents))
    return out


def read_core_collection(path: str):
    import os

    import ray.data

    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files.extend(os.path.join(root, x) for x in sorted(names))
    else:
        files = [path]

    def parse_one(row) -> list[dict]:
        return [
            {"conv_id": d, "text": c}
            for d, c in parse_core(_read_text(row["path"]))
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

"""Generic JSON document collection source — reference analog:
`JsonCollection` (`J/collection/JsonCollection.java:103-147`): each record
needs `id` + `contents`; any other keys become extra string fields. All three
reference layouts are supported: one object per file, a JSON array, and
concatenated/pretty-printed objects (JSONL included).

Documents are mapped onto the engine's transcript row shape with
conv_id = id, turn_idx = 0 (docid becomes "<id>:0"); extra fields are
carried in the `tool` column as a JSON string (the engine indexes the single
`contents` field, like the reference's default generator)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA


def parse_json_docs(text: str) -> list[tuple[str, str, dict]]:
    """-> [(id, contents, extra_fields)] from object / array / concatenated
    objects; records missing id or contents are skipped (the engine's error
    counters play the reference's InvalidDocument role)."""
    out = []
    dec = json.JSONDecoder()
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] not in "{[":
            i += 1
        if i >= n:
            break
        try:
            obj, end = dec.raw_decode(text, i)
        except json.JSONDecodeError:
            break
        i = end
        objs = obj if isinstance(obj, list) else [obj]
        for o in objs:
            if not isinstance(o, dict):
                continue
            if "id" not in o or "contents" not in o:
                continue
            extras = {
                k: str(v) for k, v in o.items() if k not in ("id", "contents")
            }
            out.append((str(o["id"]), str(o["contents"]), extras))
    return out


def read_json_collection(path: str):
    """File or directory of JSON docs -> transcript-shaped Ray Dataset ready
    for build_index."""
    import ray.data

    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files.extend(os.path.join(root, x) for x in sorted(names))
    else:
        files = [path]

    def parse_one(row) -> list[dict]:
        with open(row["path"], errors="replace") as f:
            return [
                {
                    "conv_id": d,
                    "text": c,
                    "extras": json.dumps(extras, sort_keys=True) if extras else "",
                }
                for d, c, extras in parse_json_docs(f.read())
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
                batch["extras"],
                pa.array(np.zeros(n, dtype=np.int64), type=pa.timestamp("us")),
            ],
            schema=TRANSCRIPT_SCHEMA,
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")

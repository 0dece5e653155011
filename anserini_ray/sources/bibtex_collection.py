"""BibTeX collection parser — reference `BibtexCollection.java`:
one document per entry; id = citation key, contents = `<title>. <abstract>`
(`BibtexCollection.java:107-109`). Minimal field parser covering quoted and
braced values spanning lines (the reference delegates to jbibtex; our corpus
needs only title/abstract extraction)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA

_ENTRY_RE = re.compile(r"@(\w+)\s*\{", re.S)


def _parse_fields(body: str) -> dict[str, str]:
    fields: dict[str, str] = {}
    i = 0
    n = len(body)
    while i < n:
        m = re.compile(r"\s*(\w+)\s*=\s*").match(body, i)
        if not m:
            i += 1
            continue
        name = m.group(1).lower()
        i = m.end()
        if i >= n:
            break
        c = body[i]
        if c == '"':
            j = i + 1
            while j < n and body[j] != '"':
                j += 1
            val = body[i + 1 : j]
            i = j + 1
        elif c == "{":
            depth = 1
            j = i + 1
            while j < n and depth:
                if body[j] == "{":
                    depth += 1
                elif body[j] == "}":
                    depth -= 1
                j += 1
            val = body[i + 1 : j - 1]
            i = j
        else:
            m2 = re.compile(r"[^,\s]+").match(body, i)
            val = m2.group(0) if m2 else ""
            i = m2.end() if m2 else i + 1
        fields[name] = " ".join(val.split())
        comma = body.find(",", i)
        if comma == -1:
            break
        i = comma + 1
    return fields


def parse_bibtex(text: str) -> list[tuple[str, str]]:
    """-> [(entry_id, contents)] with contents = '<title>. <abstract>'."""
    out = []
    entries = list(_ENTRY_RE.finditer(text))
    for k, m in enumerate(entries):
        start = m.end()
        end = entries[k + 1].start() if k + 1 < len(entries) else len(text)
        body = text[start:end]
        comma = body.find(",")
        if comma == -1:
            continue
        entry_id = body[:comma].strip()
        fields = _parse_fields(body[comma + 1 :])
        contents = fields.get("title", "") + ". " + fields.get("abstract", "")
        out.append((entry_id, contents))
    return out


def read_bibtex_collection(path: str):
    """Directory/file of .bib -> transcript-shaped Ray Dataset."""
    import os

    import ray.data

    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files.extend(
                os.path.join(root, x) for x in sorted(names) if x.endswith(".bib")
            )
    else:
        files = [path]

    def parse_one(row) -> list[dict]:
        with open(row["path"], errors="replace") as f:
            return [
                {"conv_id": d, "text": c} for d, c in parse_bibtex(f.read())
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

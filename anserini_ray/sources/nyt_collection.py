"""New York Times (NITF XML) collection parser — reference
`NewYorkTimesCollection.java` (via its parser): id = docdata doc-id
@id-string; contents = headline + abstract + full_text body paragraphs
joined by newlines."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA


def parse_nyt_xml(text: str) -> tuple[str, str] | None:
    """-> (id, contents) or None if unparseable."""
    # strip the DTD declaration (no external fetch)
    lines = [
        l for l in text.splitlines() if not l.strip().startswith("<!DOCTYPE")
    ]
    try:
        root = ET.fromstring("\n".join(lines))
    except ET.ParseError:
        return None
    doc_id_el = root.find(".//docdata/doc-id")
    if doc_id_el is None:
        return None
    doc_id = doc_id_el.get("id-string", "")
    parts: list[str] = []
    hl = root.find(".//hedline/hl1")
    if hl is not None and hl.text:
        parts.append(hl.text.strip())
    for p in root.findall(".//abstract/p"):
        if p.text:
            parts.append(p.text.strip())
    for block in root.findall(".//body.content/block"):
        if block.get("class") == "full_text":
            for p in block.findall("p"):
                if p.text:
                    parts.append(p.text.strip())
    return doc_id, "\n".join(parts)


def read_nyt_collection(path: str):
    import ray.data

    files = []
    if os.path.isdir(path):
        for root_, _, names in os.walk(path):
            files.extend(
                os.path.join(root_, x) for x in sorted(names)
                if x.endswith(".xml")
            )
    else:
        files = [path]

    def parse_one(row):
        with open(row["path"], errors="replace") as f:
            parsed = parse_nyt_xml(f.read())
        return (
            [{"conv_id": parsed[0], "text": parsed[1]}] if parsed else []
        )

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

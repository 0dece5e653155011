"""HtmlCollection — reference `J/collection/HtmlCollection.java`: a .tgz /
.tar.gz archive of .html files (or a bare .html file); docid = file name
without the .html suffix; contents = Jsoup-style tag-stripped text, trimmed;
raw = the file bytes as UTF-8 text.

Parse parity is tested against the reference's own bundled CACM archive
(`src/main/resources/cacm/cacm.tar.gz`, 3204 docs —
HtmlCollectionTest.java)."""

from __future__ import annotations

import os
import tarfile

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA
from .trec_collection import _strip_tags


def parse_html_archive(path: str) -> list[tuple[str, str, str]]:
    """-> [(docid, contents, raw)] for one archive (or bare .html file)."""
    out = []
    if path.endswith((".tgz", ".tar.gz")):
        with tarfile.open(path, "r:gz") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                name = os.path.basename(member.name)
                docid = name[:-5] if name.endswith(".html") else name
                raw = tf.extractfile(member).read().decode(
                    "utf-8", errors="replace"
                )
                out.append((docid, _strip_tags(raw).strip(), raw))
    else:
        name = os.path.basename(path)
        docid = name[:-5] if name.endswith(".html") else name
        with open(path, encoding="utf-8", errors="replace") as f:
            raw = f.read()
        out.append((docid, _strip_tags(raw).strip(), raw))
    return out


def read_html_collection(path: str):
    """Ray Dataset of transcript-schema rows over an HtmlCollection dir."""
    import ray.data

    files = []
    if os.path.isdir(path):
        for root_, _, names in os.walk(path):
            files.extend(
                os.path.join(root_, x)
                for x in sorted(names)
                if x.endswith((".tgz", ".tar.gz", ".html"))
            )
    else:
        files = [path]

    def parse_one(row):
        return [
            {"conv_id": d, "text": c}
            for d, c, _ in parse_html_archive(row["path"])
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

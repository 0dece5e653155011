"""Classic TREC SGML collection parser — faithful port of the reference's
`TrecCollection` record scanner (`J/collection/TrecCollection.java:109-230`):

- records span `<DOC>`..`</DOC>`; docid from `<DOCNO>`..`</DOCNO>` (also the
  `<DOC id="...">` attribute variant);
- only lines inside the allowed section tags are kept (TEXT, HEADLINE,
  TITLE, HL, HEAD, TTL, DD, DATE, LP, LEADPARA);
- `contents` = tag-stripped, whitespace-normalized text of the kept raw
  (the JsoupStringTransform analog — Jsoup's text() joins block-level text
  with single spaces).

Parsed docs map onto the engine's transcript row shape (docid "<id>:0"),
so the standard build/query pipeline runs unchanged — this is how the
reference's own end-to-end golden fixtures are replayed in
tests/test_reference_goldens.py.
"""

from __future__ import annotations

import gzip
import os
import re

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA

_START_TAGS = (
    "<TEXT>", "<HEADLINE>", "<TITLE>", "<HL>", "<HEAD>",
    "<TTL>", "<DD>", "<DATE>", "<LP>", "<LEADPARA>",
)
_END_TAGS = (
    "</TEXT>", "</HEADLINE>", "</TITLE>", "</HL>", "</HEAD>",
    "</TTL>", "</DD>", "</DATE>", "</LP>", "</LEADPARA>",
)
_ID_ATTR = re.compile(r"<DOC id=\"([^\"]+)\">.*", re.I)
_TAG = re.compile(r"<[^>]+>")


def _strip_tags(raw: str) -> str:
    """JsoupStringTransform analog: drop tags, collapse whitespace."""
    no_tags = _TAG.sub(" ", raw)
    import html

    return " ".join(html.unescape(no_tags).split())


def parse_trec_file(lines) -> list[tuple[str, str, str]]:
    """-> [(docid, contents, raw)] per the reference state machine."""
    out = []
    it = iter(lines)
    buf: list[str] = []
    found = False
    in_tag = -1
    for line in it:
        line = line.strip()
        if line.startswith("<DOC>") or line.startswith("<DOC "):
            found = True
            buf = []
            in_tag = -1
            m = _ID_ATTR.match(line)
            if m:
                buf.append(f"<DOCNO>{m.group(1)}</DOCNO>")
            else:
                for line2 in it:
                    if line2.strip().startswith("<DOCNO>"):
                        buf.append(line2.strip())
                        break
                while not any("</DOCNO>" in b for b in buf):
                    nxt = next(it, None)
                    if nxt is None:
                        break
                    buf.append(nxt.strip())
            continue
        if found:
            if line.startswith("<"):
                if in_tag >= 0 and line.startswith(_END_TAGS[in_tag]):
                    buf.append(line)
                    in_tag = -1
                elif in_tag < 0:
                    for k, t in enumerate(_START_TAGS):
                        if line.startswith(t):
                            in_tag = k
                            break
            if in_tag >= 0:
                buf.append(line)
                if line.endswith(_END_TAGS[in_tag]):
                    in_tag = -1
        if line.startswith("</DOC>"):
            joined = "\n".join(buf)
            i = joined.find("<DOCNO>")
            j = joined.find("</DOCNO>")
            if i != 0 or j == -1:
                found = False
                continue
            docid = joined[len("<DOCNO>") : j].strip()
            raw = joined[j + len("</DOCNO>") :].strip()
            out.append((docid, _strip_tags(raw), raw))
            found = False
    return out


def read_trec_collection(path: str):
    """Directory (or single file) of TREC SGML (optionally .gz) ->
    transcript-shaped Ray Dataset ready for build_index."""
    import ray.data

    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files.extend(os.path.join(root, n) for n in sorted(names))
    else:
        files = [path]

    def parse_one(row) -> list[dict]:
        fn = row["path"]
        opener = gzip.open if fn.endswith((".gz", ".z")) else open
        with opener(fn, "rt", errors="replace") as f:
            docs = parse_trec_file(f)
        return [
            {"conv_id": d, "text": c} for d, c, _ in docs
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

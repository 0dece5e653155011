"""Web-corpus collection parsers — reference analogs:

- `TrecwebCollection` (`TrecwebCollection.java:54-99`): TREC SGML variant;
  record must start with <DOCNO>; everything after </DOCHDR> is the raw HTML;
  malformed records (e.g. missing <DOCNO>) are skipped, not fatal.
- `CleanTrecCollection` (`CleanTrecCollection.java:51-53`): like TREC but
  contents == raw (no tag stripping).
- `ClueWeb09Collection` / `ClueWeb12Collection` (WARC 0.18 / 1.0,
  `ClueWeb09Collection.java:307-623`): gzip WARC streams; docid =
  WARC-TREC-ID; only `response` records are indexable; raw = record content
  after the HTTP `Content-Length:` header line (cw09) or from the first `<`
  after it (cw12); contents = tag-stripped raw.

All are verified byte-for-byte against the reference's collection unit-test
expectations (tests/test_web_collections.py)."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA
from .trec_collection import _strip_tags


# ------------------------------------------------------------------ trecweb
def parse_trecweb_file(lines) -> list[tuple[str, str, str]]:
    """-> [(docid, contents, raw)]"""
    out = []
    buf: list[str] = []
    found = False
    for line in lines:
        line = line.strip()
        if line.startswith("<DOC>"):
            found = True
            buf = []
            continue
        if line.startswith("</DOC>") and buf:
            joined = "\n".join(buf)
            if joined.startswith("<DOCNO>"):
                j = joined.find("</DOCNO>")
                hi = joined.find("<DOCHDR>")
                hj = joined.find("</DOCHDR>")
                if j != -1 and hi != -1 and hj != -1 and hj > hi:
                    docid = joined[len("<DOCNO>") : j].strip()
                    raw = joined[hj + len("</DOCHDR>") :].strip()
                    out.append((docid, _strip_tags(raw), raw))
            found = False
            buf = []
            continue
        if found:
            buf.append(line)
    return out


# --------------------------------------------------------------- clean trec
def parse_clean_trec_file(lines) -> list[tuple[str, str, str]]:
    """TREC records where contents == raw (no cleanup)."""
    from .trec_collection import parse_trec_file

    return [(d, raw, raw) for d, _, raw in parse_trec_file(lines)]


# --------------------------------------------------------------------- WARC
_HDR_END = None  # compiled lazily (re import below)


def parse_warc(stream_bytes: bytes, version: str = "WARC/0.18"):
    """-> [(trec_id_or_None, warc_type, raw_content)] per record.

    BYTE-level parsing: the header terminator matches both LF-only and
    spec-conformant CRLF (`\\r?\\n\\r?\\n`), and the body is sliced by
    Content-Length BYTES before decoding — character-offset slicing of a
    decoded stream misaligns on CRLF or non-ASCII records (the reference
    reads bytes via readLine, which handles both endings)."""
    import re

    global _HDR_END
    if _HDR_END is None:
        _HDR_END = re.compile(rb"\r?\n\r?\n")
    marker = version.encode()
    out = []
    pos = 0
    while True:
        start = stream_bytes.find(marker, pos)
        if start == -1:
            break
        m = _HDR_END.search(stream_bytes, start)
        if m is None:
            break
        header = stream_bytes[start : m.start()].decode(
            "utf-8", errors="replace"
        )
        fields: dict[str, str] = {}
        for line in header.splitlines()[1:]:
            k, _, v = line.partition(":")
            fields[k.strip()] = v.strip()
        try:
            length = int(fields.get("Content-Length", "0"))
        except ValueError:
            length = 0
        body_start = m.end()
        body = stream_bytes[body_start : body_start + length].decode(
            "utf-8", errors="replace"
        )
        pos = body_start + length
        out.append(
            (
                fields.get("WARC-TREC-ID"),
                fields.get("WARC-Type", ""),
                body,
            )
        )
    return out


def _warc_http_payload(body: str, cw12: bool = False) -> str:
    """Reference getContent: drop the HTTP headers by cutting after the
    `Content-Length:` header line (cw09) or at the first '<' after it
    (cw12, ClueWeb12Collection.java:555-563)."""
    i = body.find("Content-Length:")
    if i == -1:
        return body
    j = body.find("\n", i)
    if j == -1:
        return body
    if cw12:
        k = body.find("<", j)
        return body[k:] if k != -1 else body[j + 1 :]
    return body[j + 1 :]


def parse_clueweb_file(path: str, version: str = "WARC/0.18"):
    """-> [(docid, contents, raw)] of indexable (response) records."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    cw12 = version == "WARC/1.0"
    out = []
    for trec_id, wtype, body in parse_warc(data, version):
        if wtype != "response" or not trec_id:
            continue
        raw = _warc_http_payload(body, cw12)
        # the WARC record-separator newline rides inside Content-Length in
        # these fixtures; the reference's record reader does not surface it
        if raw.endswith("\n"):
            raw = raw[:-1]
        out.append((trec_id, _strip_tags(raw), raw))
    return out


# --------------------------------------------------------------- Ray readers
def _docs_to_dataset(doc_lists_fn, files):
    import ray.data

    ds = ray.data.from_items([{"path": f} for f in files]).flat_map(doc_lists_fn)

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


def _list_files(path: str):
    if os.path.isdir(path):
        files = []
        for root, _, names in os.walk(path):
            files.extend(os.path.join(root, x) for x in sorted(names))
        return files
    return [path]


def read_trecweb_collection(path: str):
    def parse_one(row):
        with open(row["path"], errors="replace") as f:
            return [
                {"conv_id": d, "text": c} for d, c, _ in parse_trecweb_file(f)
            ]

    return _docs_to_dataset(parse_one, _list_files(path))


def read_clean_trec_collection(path: str):
    def parse_one(row):
        with open(row["path"], errors="replace") as f:
            return [
                {"conv_id": d, "text": c}
                for d, c, _ in parse_clean_trec_file(f)
            ]

    return _docs_to_dataset(parse_one, _list_files(path))


def read_clueweb_collection(path: str, version: str = "WARC/0.18"):
    def parse_one(row):
        return [
            {"conv_id": d, "text": c}
            for d, c, _ in parse_clueweb_file(row["path"], version)
        ]

    return _docs_to_dataset(parse_one, _list_files(path))

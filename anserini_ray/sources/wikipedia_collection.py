"""Wikipedia (MediaWiki XML dump, optionally .bz2) collection parser —
reference `WikipediaCollection.java`: one doc per main-namespace page; id =
page title; contents = "<title>.\n" + cleaned article text.

The reference delegates markup cleaning to the WikiClean library; this
parser applies a best-effort wikitext cleanup (templates, links, emphasis,
headings) plus the observable newline-to-space behavior, verified against
the reference's unit-test expectation on its sample dump."""

from __future__ import annotations

import bz2
import os
import re

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA

# lenient extraction: real dumps (and the reference fixture!) contain
# malformed fragments (e.g. unclosed <revision>)
_PAGE = re.compile(r"<page>(.*?)</page>", re.S)
_TITLE = re.compile(r"<title>(.*?)</title>", re.S)
_NSNUM = re.compile(r"<ns>(.*?)</ns>", re.S)
_TEXT = re.compile(r"<text[^>]*>(.*?)</text>", re.S)

_TEMPLATE = re.compile(r"\{\{[^{}]*\}\}")
_LINK = re.compile(r"\[\[(?:[^|\]]*\|)?([^\]]*)\]\]")
_EMPH = re.compile(r"'{2,}")
_HEADING = re.compile(r"={2,}\s*([^=]*?)\s*={2,}")


def clean_wikitext(text: str) -> str:
    prev = None
    while prev != text:  # nested templates
        prev = text
        text = _TEMPLATE.sub("", text)
    text = _LINK.sub(r"\1", text)
    text = _HEADING.sub(r"\1", text)
    text = _EMPH.sub("", text)
    # reference collapses newline RUNS to one space each
    # (WikipediaCollection.java:76: replaceAll("\\n+", " "))
    return re.sub(r"\n+", " ", text).strip()


def parse_wikipedia(data: bytes) -> list[tuple[str, str]]:
    """-> [(title, contents)] for main-namespace pages."""
    import html

    text_all = data.decode("utf-8", errors="replace")
    out = []
    for m in _PAGE.finditer(text_all):
        body = m.group(1)
        ns = _NSNUM.search(body)
        if ns and ns.group(1).strip() not in ("", "0"):
            continue
        tm = _TITLE.search(body)
        title = html.unescape(tm.group(1)) if tm else ""
        xm = _TEXT.search(body)
        wikitext = html.unescape(xm.group(1)) if xm else ""
        cleaned = clean_wikitext(wikitext)
        if cleaned.startswith("#REDIRECT"):
            # reference skips redirect stubs (WikipediaCollection.java:78)
            continue
        out.append((title, f"{title}.\n{cleaned}"))
    return out


def read_wikipedia_collection(path: str):
    import ray.data

    files = []
    if os.path.isdir(path):
        for root_, _, names in os.walk(path):
            files.extend(os.path.join(root_, x) for x in sorted(names))
    else:
        files = [path]

    def parse_one(row):
        fn = row["path"]
        opener = bz2.open if fn.endswith(".bz2") else open
        with opener(fn, "rb") as f:
            return [
                {"conv_id": t, "text": c} for t, c in parse_wikipedia(f.read())
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

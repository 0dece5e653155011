"""Topic (query set) readers — reference analogs in
`J/search/topicreader/` (registry at TopicReader.java:43-94).

- read_tsv_topics: `TsvIntTopicReader` (tab-split, int qids, sorted —
  TsvIntTopicReader.java:46-59; the reference keeps topics in a SortedMap,
  TopicReader.java:100-119)
- read_tsv_string_topics: `TsvStringTopicReader` (string qids)
- read_trec_topics: classic TREC SGML `<top><num><title><desc><narr>`
  (`TrecTopicReader.java`)
"""

from __future__ import annotations

import re


def read_tsv_topics(path: str) -> list[tuple[int, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, text = line.split("\t", 1)
            out.append((int(qid), text))
    out.sort(key=lambda x: x[0])
    return out


def read_tsv_string_topics(path: str) -> list[tuple[str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, text = line.split("\t", 1)
            out.append((qid, text))
    out.sort(key=lambda x: x[0])
    return out


_TOP_RE = re.compile(r"<top>(.*?)</top>", re.S | re.I)
_NUM_RE = re.compile(r"<num>\s*(?:Number:)?\s*(\S+)", re.I)
_TITLE_RE = re.compile(r"<title>\s*(?:Topic:)?\s*(.*?)(?=<desc>|<narr>|$)", re.S | re.I)
_DESC_RE = re.compile(r"<desc>\s*(?:Description:)?\s*(.*?)(?=<narr>|$)", re.S | re.I)
_NARR_RE = re.compile(r"<narr>\s*(?:Narrative:)?\s*(.*?)$", re.S | re.I)


def read_trec_topics(path: str) -> dict[int, dict[str, str]]:
    """qid -> {"title", "description", "narrative"} (whitespace-normalized),
    sorted by qid like the reference's SortedMap."""
    with open(path) as f:
        raw = f.read()
    topics: dict[int, dict[str, str]] = {}
    for m in _TOP_RE.finditer(raw):
        body = m.group(1)
        num = _NUM_RE.search(body)
        if not num:
            continue
        qid = int(re.sub(r"\D", "", num.group(1)) or 0)

        def _clean(match):
            return " ".join(match.group(1).split()) if match else ""

        topics[qid] = {
            "title": _clean(_TITLE_RE.search(body)),
            "description": _clean(_DESC_RE.search(body)),
            "narrative": _clean(_NARR_RE.search(body)),
        }
    return dict(sorted(topics.items()))


_MB_TOP = re.compile(r"<top>(.*?)</top>", re.S | re.I)
_MB_NUM = re.compile(r"<num>\s*(?:Number:)?\s*MB(\d+)", re.I)
_MB_QUERY = re.compile(r"<query>\s*(.*?)\s*</query>", re.S | re.I)
_MB_TWEETTIME = re.compile(r"<querytweettime>\s*(\d+)\s*</querytweettime>", re.I)


def read_microblog_topics(path: str) -> list[tuple[int, str, int]]:
    """MicroblogTopicReader analog: -> [(qid, query, querytweettime)]."""
    with open(path) as f:
        raw = f.read()
    out = []
    for m in _MB_TOP.finditer(raw):
        body = m.group(1)
        num = _MB_NUM.search(body)
        q = _MB_QUERY.search(body)
        t = _MB_TWEETTIME.search(body)
        if num and q:
            out.append(
                (int(num.group(1)), " ".join(q.group(1).split()),
                 int(t.group(1)) if t else 2**62)
            )
    return sorted(out)

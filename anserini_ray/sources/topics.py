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


def _open_topics(path: str):
    # Java InputStreamReader(UTF_8) replaces malformed bytes with U+FFFD
    return open(path, encoding="utf-8", errors="replace")


# ---------------------------------------------------------------------------
# Round-2 readers — remaining reference topic families (registry at
# `J/search/topicreader/TopicReader.java:43-94`). Quirks are ported exactly;
# each reader is parse-parity-tested against the reference's own bundled
# topics files and its unit-test expectations
# (`T/search/topicreader/*Test.java`).
# ---------------------------------------------------------------------------


def read_web_topics(path: str) -> dict[int, dict[str, str]]:
    """WebTopicReader.java: `qid:query` lines; Java `split(":")` keeps only
    the segment between the first and second colon as the title (quirk
    ported verbatim)."""
    out: dict[int, dict[str, str]] = {}
    with _open_topics(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            arr = line.split(":")
            out[int(arr[0])] = {"title": arr[1]}
    return dict(sorted(out.items()))


def read_prioritized_web_topics(path: str) -> dict[int, dict[str, str]]:
    """PrioritizedWebTopicReader.java: `qid:priority:query` — title is the
    substring after the LAST colon, priority between the first two."""
    out: dict[int, dict[str, str]] = {}
    with _open_topics(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            first = line.index(":")
            second = line.index(":", first + 1)
            out[int(line[:first])] = {
                "title": line[line.rindex(":") + 1 :],
                "priority": line[first + 1 : second],
            }
    return dict(sorted(out.items()))


def read_webxml_topics(path: str) -> dict[int, dict[str, str]]:
    """WebxmlTopicReader.java: line-oriented scan of the Web-track XML —
    `number="..."` attribute on `<topic`, single-line `<query>` elements."""
    out: dict[int, dict[str, str]] = {}
    fields: dict[str, str] = {}
    number = ""
    with _open_topics(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("<topic"):
                i = line.index("number")
                j = line.index('"', i + len("number") + 2)
                number = line[i + len("number") + 2 : j]
            if line.startswith("<query>") and line.endswith("</query>"):
                fields["title"] = line[7:-8].strip()
            if line.startswith("</topic>"):
                out[int(number)] = fields
                fields = {}
    return dict(sorted(out.items()))


def read_car_topics(path: str) -> dict[str, dict[str, str]]:
    """CarTopicReader.java: one URL-encoded heading path per line; key is
    the raw line, title is the decoded line without the `enwiki:` prefix
    (URLDecoder semantics: '+' decodes to space)."""
    from urllib.parse import unquote_plus

    out: dict[str, dict[str, str]] = {}
    with _open_topics(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out[line] = {"title": unquote_plus(re.sub(r"^enwiki:", "", line))}
    return dict(sorted(out.items()))


def read_cacm_topics(path: str) -> dict[int, dict[str, str]]:
    """CacmTopicReader.java: `<DOC><DOCNO> n </DOCNO> ...query text...</DOC>`
    blocks; title keeps interior newlines (the reference appends '\\n' per
    line)."""
    out: dict[int, dict[str, str]] = {}
    docno_re = re.compile(r"<DOCNO>\s*(.*?)\s*</DOCNO>", re.S)
    with _open_topics(path) as f:
        lines = iter(f)
        for line in lines:
            if not line.strip().startswith("<DOC>"):
                continue
            qid = None
            for line in lines:
                if line.startswith("<DOCNO>"):
                    m = docno_re.search(line)
                    if not m:
                        raise ValueError(f"Error parsing {line!r}")
                    qid = int(m.group(1))
                    break
            buf: list[str] = []
            for line in lines:
                if line.startswith("</DOC>"):
                    out[qid] = {"title": "\n".join(buf) + "\n" if buf else ""}
                    break
                buf.append(line.rstrip("\n"))
    return dict(sorted(out.items()))


def read_ntcir_topics(path: str) -> dict[int, dict[str, str]]:
    """NtcirTopicReader.java: `<qid>`, single-line `<content>` (title) and
    `<description>`; a topic closes at `</query>`."""
    out: dict[int, dict[str, str]] = {}
    fields: dict[str, str] = {}
    number = ""
    with _open_topics(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("<qid"):
                number = line[5:-6].strip()
            if line.startswith("<content>") and line.endswith("</content>"):
                fields["title"] = line[9:-10].strip()
            if line.startswith("<description>") and line.endswith("</description>"):
                fields["description"] = line[13:-14].strip()
            if line.startswith("</query>"):
                out[int(number)] = fields
                fields = {}
    return dict(sorted(out.items()))


def read_qa_topics(path: str) -> dict[int, dict[str, str]]:
    """QaTopicReader.java: `<QApairs id='...'>` blocks; the title is the
    line FOLLOWING a `<question>` line."""
    out: dict[int, dict[str, str]] = {}
    id_re = re.compile(r"<QApairs id='(.*)'>")
    prev = ""
    qid = ""
    with _open_topics(path) as f:
        for line in f:
            line = line.rstrip("\n")
            m = id_re.search(line)
            if m:
                qid = m.group(1)
            if prev.startswith("<question>"):
                out[int(qid)] = {"title": line}
            prev = line
    return dict(sorted(out.items()))


def read_background_linking_topics(path: str) -> dict[int, dict[str, str]]:
    """BackgroundLinkingTopicReader.java: `<num> Number: n </num>`,
    `<docid>` (becomes the title), `<url>` — tolerating the TREC 2018 files'
    unclosed `<url>` tags."""
    out: dict[int, dict[str, str]] = {}
    fields: dict[str, str] = {}
    number = ""
    num_re = re.compile(r"<num> Number: (\d+) </num>", re.S)
    docid_re = re.compile(r"<docid>\s*(.*?)\s*</docid>", re.S)
    url_re = re.compile(r"<url>\s*(.*?)\s*</?url>", re.S)
    with _open_topics(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("<num>") and line.endswith("</num>"):
                m = num_re.search(line)
                if not m:
                    raise ValueError(f"Error parsing {line!r}")
                number = m.group(1)
            if line.startswith("<docid>") and line.endswith("</docid>"):
                m = docid_re.search(line)
                if not m:
                    raise ValueError(f"Error parsing {line!r}")
                fields["title"] = m.group(1)
            if line.startswith("<url>") and (
                line.endswith("</url>") or line.endswith("<url>")
            ):
                m = url_re.search(line)
                if not m:
                    raise ValueError(f"Error parsing {line!r}")
                fields["url"] = m.group(1)
            if line.startswith("</top>"):
                out[int(number)] = fields
                fields = {}
    return dict(sorted(out.items()))

"""Freebase knowledge-graph subsystem — reference `J/kg/Freebase.java`
(gzipped N-Triples reader grouping consecutive same-subject triples into
nodes), `J/kg/FreebaseNode.java` (URI shortening, MQL key unescaping,
object typing), and the Lookup tools (`LookupFreebaseNodes.java` /
`LookupFreebaseTriples.java`) re-expressed as Dataset filters.

Parse parity is tested against the reference's own
`freebase-rdf-head100.gz` fixture with the exact `FreebaseTest.java` /
`FreebaseNodeTest.java` expectations. The literal parser replaces Sesame's
NTriplesUtil with a direct N-Triples unescape (\\" \\\\ \\n \\t \\r \\uXXXX
\\UXXXXXXXX) — the subset those tests exercise."""

from __future__ import annotations

import gzip
import os
import re

FREEBASE_NS_LONG = re.compile(r"^http://rdf\.freebase\.com/ns/")
FREEBASE_NS_SHORT = "fb:"
FREEBASE_KEY_LONG = re.compile(r"^http://rdf\.freebase\.com/key/")
FREEBASE_KEY_SHORT = "fbkey:"

_TRIPLE_SPLITTER = "\t"


class FreebaseNode:
    def __init__(self, uri: str):
        self.uri = uri
        self._pv: dict[str, list[str]] = {}

    def add_predicate_value(self, p: str, o: str) -> "FreebaseNode":
        self._pv.setdefault(p, []).append(o)
        return self

    @property
    def predicate_values(self) -> dict[str, list[str]]:
        """Sorted by predicate (the reference stores a TreeMap)."""
        return dict(sorted(self._pv.items()))

    def __str__(self) -> str:
        out = []
        for p, vals in self.predicate_values.items():
            for v in vals:
                out.append(f"{self.uri}\t{p}\t{v}\t.\n")
        return "".join(out)


def clean_uri(uri: str) -> str:
    if uri and uri[0] == "<":
        uri = uri[1:-1].lower()
    uri = FREEBASE_NS_LONG.sub(FREEBASE_NS_SHORT, uri)
    uri = FREEBASE_KEY_LONG.sub(FREEBASE_KEY_SHORT, uri)
    return uri


def get_object_type(obj: str) -> str:
    """'uri' | 'string' | 'text' | 'other' (FreebaseNode.RdfObjectType)."""
    c = obj[0] if obj else ""
    if c == "<":
        return "uri"
    if c == '"':
        return "string" if obj.endswith('"') else "text"
    return "other"


def _undo_mql_key_escape(s: str) -> str:
    parts = s.split("$")
    out = [parts[0]]
    for part in parts[1:]:
        try:
            out.append(chr(int(part[:4], 16)) + part[4:])
        except (ValueError, IndexError):
            out.append(part)
    return "".join(out)


def _remove_enclosing_quote(s: str) -> str:
    return s[1:-1] if s and s[0] == '"' else s


def normalize_object_value(obj: str) -> str:
    t = get_object_type(obj)
    if t == "uri":
        return clean_uri(obj)
    if t == "string":
        if "$" in obj:
            return _remove_enclosing_quote(_undo_mql_key_escape(obj))
        return _remove_enclosing_quote(obj)
    return obj


_NT_UNESCAPES = {
    '\\"': '"', "\\\\": "\\", "\\n": "\n", "\\t": "\t", "\\r": "\r",
}
_NT_ESCAPE_RE = re.compile(
    r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})|\\[\"\\ntr]"
)


def nt_unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        return _NT_UNESCAPES[m.group(0)]

    return _NT_ESCAPE_RE.sub(sub, s)


def extract_value_from_typed_literal(literal: str) -> str:
    """Lexical value of '"..."@lang' / '"..."^^<type>' / '"..."' literals."""
    m = re.match(r'^"(.*)"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?$', literal, re.S)
    return nt_unescape(m.group(1)) if m else literal


def freebase_uri_to_freebase_id(uri: str) -> str:
    return uri[uri.rindex("/") :].replace(".", "/")


def freebase_nodes(path: str):
    """Iterate FreebaseNodes: consecutive same-subject triples grouped
    (Freebase.java iterator semantics — comments/blank/short lines
    skipped)."""
    opener = gzip.open if path.endswith(".gz") else open
    current: FreebaseNode | None = None
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            triple = line.split(_TRIPLE_SPLITTER)
            if len(triple) != 4:
                continue
            s, p, o = triple[0], triple[1], triple[2]
            if current is None:
                current = FreebaseNode(s).add_predicate_value(p, o)
            elif s == current.uri:
                current.add_predicate_value(p, o)
            else:
                yield current
                current = FreebaseNode(s).add_predicate_value(p, o)
    if current is not None:
        yield current


def read_freebase_triples(path: str):
    """Ray Dataset of (subject, predicate, object) rows over N-Triples .gz
    files — the distributed surface for the Lookup tools: one flat_map task
    per file, nothing driver-side."""
    import ray.data

    files = []
    if os.path.isdir(path):
        for root_, _, names in os.walk(path):
            files.extend(os.path.join(root_, x) for x in sorted(names))
    else:
        files = [path]

    def parse_one(row):
        opener = gzip.open if row["path"].endswith(".gz") else open
        out = []
        with opener(row["path"], "rt", encoding="utf-8",
                    errors="replace") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                t = line.split(_TRIPLE_SPLITTER)
                if len(t) != 4:
                    continue
                out.append(
                    {"subject": t[0], "predicate": t[1], "object": t[2]}
                )
        return out

    return ray.data.from_items([{"path": f} for f in files]).flat_map(parse_one)


def freebase_node_docs(path: str):
    """Ray Dataset of indexable node docs (IndexFreebase analog): docid =
    cleaned subject URI, text = normalized STRING/TEXT object values."""
    import ray.data

    def rows():
        for node in freebase_nodes(path):
            texts = []
            for p, vals in node.predicate_values.items():
                for v in vals:
                    t = get_object_type(v)
                    if t == "string":
                        texts.append(normalize_object_value(v))
                    elif t == "text":
                        texts.append(extract_value_from_typed_literal(v))
            yield {"doc_id": clean_uri(node.uri), "text": " ".join(texts)}

    return ray.data.from_items(list(rows()))


def lookup_freebase_node(path: str, subject_uri: str) -> FreebaseNode | None:
    """LookupFreebaseNodes analog: exact subject lookup (accepts cleaned or
    raw URIs)."""
    want = clean_uri(subject_uri)
    for node in freebase_nodes(path):
        if node.uri == subject_uri or clean_uri(node.uri) == want:
            return node
    return None

"""CarCollection — TREC Complex Answer Retrieval paragraph corpora
(reference `J/collection/CarCollection.java`: docid = paraId, contents =
paragraph text-only; the reference delegates decoding to trec-car-tools'
`DeserializeData.iterableParagraphs`).

No cbor library exists in this environment, so this module carries a
minimal RFC 8949 CBOR decoder (major types 0-5 + 7, definite and
indefinite lengths) and the trec-car v2.0 paragraph schema:

    Paragraph := [0, paraId: tstr, [ParaBody ...]]
    ParaBody  := [0, text: tstr]                      (ParaText)
               | [1, ...link fields..., anchor: tstr] (ParaLink — the LAST
                                                       text element is the
                                                       anchor text)

`getTextOnly` concatenates ParaText text and ParaLink anchor text. The
schema note is an assumption documented here (the reference repo bundles no
.cbor fixture to golden-test against); the decoder itself is round-trip
tested against hand-built RFC 8949 byte strings."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA

_BREAK = object()


def _read_uint(data: bytes, pos: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, pos
    if info == 24:
        return data[pos], pos + 1
    if info == 25:
        return struct.unpack_from(">H", data, pos)[0], pos + 2
    if info == 26:
        return struct.unpack_from(">I", data, pos)[0], pos + 4
    if info == 27:
        return struct.unpack_from(">Q", data, pos)[0], pos + 8
    if info == 31:
        return -1, pos  # indefinite length
    raise ValueError(f"bad CBOR additional info {info}")


def cbor_decode_item(data: bytes, pos: int = 0):
    """Decode one CBOR data item -> (value, next_pos)."""
    b = data[pos]
    major, info = b >> 5, b & 0x1F
    pos += 1
    if major == 7 and info == 31:
        return _BREAK, pos
    n, pos = _read_uint(data, pos, info)
    if major == 0:
        return n, pos
    if major == 1:
        return -1 - n, pos
    if major in (2, 3):  # byte / text string
        if n == -1:  # indefinite: concatenation of definite chunks
            parts = []
            while True:
                v, pos = cbor_decode_item(data, pos)
                if v is _BREAK:
                    break
                parts.append(v if isinstance(v, bytes) else v.encode())
            raw = b"".join(parts)
        else:
            raw = data[pos : pos + n]
            pos += n
        return (raw if major == 2 else raw.decode("utf-8")), pos
    if major == 4:  # array
        items = []
        if n == -1:
            while True:
                v, pos = cbor_decode_item(data, pos)
                if v is _BREAK:
                    break
                items.append(v)
        else:
            for _ in range(n):
                v, pos = cbor_decode_item(data, pos)
                items.append(v)
        return items, pos
    if major == 5:  # map
        out = {}
        if n == -1:
            while True:
                k, pos = cbor_decode_item(data, pos)
                if k is _BREAK:
                    break
                v, pos = cbor_decode_item(data, pos)
                out[k] = v
        else:
            for _ in range(n):
                k, pos = cbor_decode_item(data, pos)
                v, pos = cbor_decode_item(data, pos)
                out[k] = v
        return out, pos
    if major == 6:  # tag: skip, decode tagged item
        return cbor_decode_item(data, pos)
    if major == 7:
        if info == 20:
            return False, pos
        if info == 21:
            return True, pos
        if info == 22:
            return None, pos
        return n, pos
    raise ValueError(f"bad CBOR major type {major}")


def _para_text_only(bodies) -> str:
    parts = []
    for body in bodies:
        if not isinstance(body, list) or not body:
            continue
        tag = body[0]
        if tag == 0 and len(body) > 1:
            parts.append(str(body[1]))
        elif tag == 1:
            # ParaLink: the last text element is the visible anchor
            texts = [x for x in body[1:] if isinstance(x, str)]
            if texts:
                parts.append(texts[-1])
    return "".join(parts)


def parse_car_paragraphs(data: bytes) -> list[tuple[str, str]]:
    """-> [(paraId, text)] from a trec-car paragraphs .cbor stream."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        item, pos = cbor_decode_item(data, pos)
        if not isinstance(item, list) or len(item) < 3:
            continue
        tag, para_id, bodies = item[0], item[1], item[2]
        if tag != 0:
            continue
        if isinstance(para_id, bytes):
            para_id = para_id.decode("utf-8", errors="replace")
        out.append((str(para_id), _para_text_only(bodies)))
    return out


def read_car_collection(path: str):
    """Ray Dataset of transcript-schema rows over .cbor paragraph files."""
    import ray.data

    files = []
    if os.path.isdir(path):
        for root_, _, names in os.walk(path):
            files.extend(
                os.path.join(root_, x)
                for x in sorted(names)
                if x.endswith(".cbor")
            )
    else:
        files = [path]

    def parse_one(row):
        with open(row["path"], "rb") as f:
            return [
                {"conv_id": d, "text": t}
                for d, t in parse_car_paragraphs(f.read())
            ]

    ds = ray.data.from_items([{"path": f} for f in files]).flat_map(parse_one)

    def to_rows(batch: pa.Table) -> pa.Table:
        n2 = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch["conv_id"],
                pa.array(np.zeros(n2, dtype=np.int32)),
                pa.array(["doc"] * n2),
                batch["text"],
                pa.array([""] * n2),
                pa.array(np.zeros(n2, dtype=np.int64), type=pa.timestamp("us")),
            ],
            schema=TRANSCRIPT_SCHEMA,
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")

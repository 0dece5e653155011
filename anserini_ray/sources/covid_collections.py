"""CORD-19 (Covid) collections — reference `J/collection/CovidCollection.
java`, `CovidFullTextCollection.java`, `CovidParagraphCollection.java`,
`CovidTrialstreamerCollection.java`: a metadata.csv (headers
case-insensitive, values trimmed) drives the corpus; contents =
title (newlines to spaces) + "\\n" + abstract; the full-text variants pull
the pdf-parse JSON at
`<base>/<full_text_file>/pdf_json/<last sha>.json` when
has_pdf_parse contains "True" (CovidCollectionDocument.java:35-46):

- covid              contents = title+abstract; raw = fulltext json | record json
- covid_fulltext     contents += "\\n " + fulltext json STRING (the reference
                     appends the raw JSON text, quirk ported)
- covid_paragraph    one extra doc per body_text paragraph, docid =
                     cord_uid.%05d (paragraph 0 = title+abstract only)
- covid_trialstreamer  like covid + the parsed `facets` node exposed

The reference repo bundles no CORD-19 fixture; tests use self-authored
metadata.csv + pdf_json files following the published CORD-19 layout.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA


def _read_metadata(csv_path: str) -> list[dict]:
    with open(csv_path, encoding="utf-8", errors="replace", newline="") as f:
        reader = csv.DictReader(f)
        rows = []
        for rec in reader:
            rows.append(
                {
                    (k or "").strip().lower(): (v or "").strip()
                    for k, v in rec.items()
                }
            )
        return rows


def _full_text_json(base_path: str, rec: dict) -> str | None:
    if "True" not in rec.get("has_pdf_parse", ""):
        return None
    shas = rec.get("sha", "").split(";")
    p = os.path.join(
        base_path, rec.get("full_text_file", ""), "pdf_json",
        shas[-1].strip() + ".json",
    )
    try:
        with open(p, encoding="utf-8") as f:
            return f.read()
    except OSError:
        return None


def _base_contents(rec: dict) -> str:
    content = rec.get("title", "").replace("\n", " ")
    abstract = rec.get("abstract", "")
    return content + ("" if not abstract else "\n" + abstract)


def parse_covid_metadata(
    csv_path: str, base_path: str | None = None, variant: str = "covid"
) -> list[tuple[str, str, str]]:
    """-> [(docid, contents, raw)] per the selected variant."""
    base_path = base_path or os.path.dirname(csv_path)
    out = []
    for rec in _read_metadata(csv_path):
        cid = rec.get("cord_uid", "")
        content = _base_contents(rec)
        full = _full_text_json(base_path, rec)
        raw = full if full is not None else json.dumps(rec)
        if variant in ("covid", "covid_trialstreamer"):
            out.append((cid, content, raw))
        elif variant == "covid_fulltext":
            if full is not None and full:
                content = content + "\n " + full
            out.append((cid, content, raw))
        elif variant == "covid_paragraph":
            out.append((cid, content, full or ""))
            if full is not None:
                try:
                    body = json.loads(full).get("body_text", [])
                except ValueError:
                    body = []
                for i, para in enumerate(body, start=1):
                    text = para.get("text", "") if isinstance(para, dict) else ""
                    out.append(
                        (f"{cid}.{i:05d}", content + "\n" + text, full)
                    )
        else:
            raise ValueError(f"unknown covid variant {variant!r}")
    return out


def covid_facets(csv_path: str, base_path: str | None = None) -> dict[str, list]:
    """cord_uid -> trialstreamer `facets` (CovidTrialstreamerCollection's
    Document.facets())."""
    base_path = base_path or os.path.dirname(csv_path)
    out = {}
    for rec in _read_metadata(csv_path):
        full = _full_text_json(base_path, rec)
        if full:
            try:
                out[rec.get("cord_uid", "")] = json.loads(full).get("facets")
            except ValueError:
                pass
    return out


def read_covid_collection(path: str, variant: str = "covid"):
    """Ray Dataset over a CORD-19 layout (dir containing metadata .csv
    files). One flat_map task per csv (row-group-level splitting is inside
    the per-file parse; CORD-19 metadata files are modest)."""
    import ray.data

    files = []
    if os.path.isdir(path):
        for root_, _, names in os.walk(path):
            files.extend(
                os.path.join(root_, x) for x in sorted(names)
                if x.endswith(".csv")
            )
        base = path
    else:
        files = [path]
        base = os.path.dirname(path)

    def parse_one(row):
        return [
            {"conv_id": d, "text": c}
            for d, c, _ in parse_covid_metadata(row["path"], base, variant)
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

"""Transcript corpus sources.

The engine's input table is a Parquet corpus of multi-turn conversation /
agent transcripts: (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us]); each turn is one document with
docid = f"{conv_id}:{turn_idx}" (reference analog: SourceDocument.id/contents,
`J/collection/SourceDocument.java:24-53`).

Two deterministic sources:

1. ``transcripts_from_documents(sf_dir)`` — derives a transcript table from
   the driver-provided ``documents.parquet`` with a pure rowwise mapping so
   the exact same derivation is expressible in DuckDB SQL
   (see TRANSCRIPTS_SQL) for the correctness oracle.
2. ``generate_transcripts(...)`` — a seeded synthetic generator with analyzer
   edge cases (empties, possessives, mixed case, hot terms, duplicate texts)
   for unit tests and large-scale benchmarks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TURNS_PER_CONV = 8
_ROLES = ("user", "assistant", "tool", "assistant")

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# DuckDB-side mirror of transcripts_from_documents, as a CTE body over the
# pre-registered `documents` view. Keep in exact sync with the Arrow code.
TRANSCRIPTS_SQL = """
    SELECT
      'conv-' || lpad(CAST(doc_id // 8 AS VARCHAR), 6, '0') AS conv_id,
      CAST(doc_id % 8 AS INTEGER) AS turn_idx,
      CASE CAST(doc_id % 4 AS INTEGER)
        WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
        WHEN 2 THEN 'tool' ELSE 'assistant' END AS role,
      text,
      CASE WHEN CAST(doc_id % 4 AS INTEGER) = 2 THEN 'search' ELSE '' END AS tool,
      TIMESTAMP '2026-01-01 00:00:00' + to_microseconds(doc_id * 1000000) AS ts
    FROM documents
"""


def _doc_batch_to_transcripts(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"]
    conv_num = pc.divide(doc_id, 8)
    conv_id = pc.binary_join_element_wise(
        pa.array(["conv-"] * len(batch)),
        pc.utf8_lpad(pc.cast(conv_num, pa.string()), 6, "0"),
        "",
    )
    turn_idx = pc.cast(pc.subtract(doc_id, pc.multiply(conv_num, 8)), pa.int32())
    role_idx = pc.cast(
        pc.subtract(doc_id, pc.multiply(pc.divide(doc_id, 4), 4)), pa.int32()
    )
    roles = pc.take(pa.array(list(_ROLES)), role_idx)
    tool = pc.if_else(
        pc.equal(role_idx, 2),
        pa.array(["search"] * len(batch)),
        pa.array([""] * len(batch)),
    )
    base = np.int64(1767225600_000000)  # 2026-01-01T00:00:00Z in us
    ts = pa.array(
        base + doc_id.to_numpy(zero_copy_only=False) * 1_000_000,
        type=pa.timestamp("us"),
    )
    return pa.Table.from_arrays(
        [conv_id, turn_idx, roles, batch["text"], tool, ts],
        schema=TRANSCRIPT_SCHEMA,
    )


def transcripts_from_documents(sf_dir: str):
    """Ray Dataset of transcripts derived from ``{sf_dir}/documents.parquet``.

    Streams: read_parquet (only doc_id+text columns) -> map_batches rowwise
    derivation; no shuffle, no materialization.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(_doc_batch_to_transcripts, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Seeded synthetic generator (tests + bench; analyzer edge-case coverage per
# reference test corpora, cf. T/IndexerTestBase.java:44-93).
# ---------------------------------------------------------------------------

_COMMON = (
    "merge sort join scan filter window stream batch table row column key "
    "query plan index hash range shuffle spill actor task block arrow vector "
    "schedule city bus running train data value agent tool model token"
).split()
_RARE = [f"zq{i:04d}" for i in range(400)]
_SPICE = [
    "City's", "don't", "U.S.A.", "3.14", "1,000", "state-of-the-art",
    "The", "AND", "O'Neil's", "running!", "schedule.",
]
_STOPS = "the a an of to in on is are and or".split()
HOT_TERM = "pipeline"


def generate_transcripts(
    num_turns: int, seed: int = 42, empty_frac: float = 0.01
) -> pa.Table:
    rng = np.random.default_rng(seed)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    zipf_p = 1.0 / np.arange(1, len(_COMMON) + 1)
    zipf_p /= zipf_p.sum()
    for i in range(num_turns):
        conv = i // TURNS_PER_CONV
        turn = i % TURNS_PER_CONV
        conv_ids.append(f"conv-{conv:06d}")
        turn_idxs.append(turn)
        roles.append(_ROLES[i % 4])
        tools.append("search" if i % 4 == 2 else "")
        tss.append(1767225600_000000 + i * 1_000_000)
        r = rng.random()
        if r < empty_frac:
            texts.append("" if r < empty_frac / 2 else "   ")
            continue
        n = int(rng.integers(3, 40))
        words = list(rng.choice(_COMMON, size=n, p=zipf_p))
        if rng.random() < 0.5:
            words.append(HOT_TERM)
        if rng.random() < 0.3:
            words.append(str(rng.choice(_STOPS)))
        if rng.random() < 0.15:
            words.append(str(rng.choice(_SPICE)))
        if rng.random() < 0.1:
            words.append(str(rng.choice(_RARE)))
        if rng.random() < 0.02 and texts:
            # duplicate an earlier text: exercises score-tie docid break
            texts.append(texts[int(rng.integers(0, len(texts)))])
            continue
        texts.append(" ".join(words))
    return pa.Table.from_arrays(
        [
            pa.array(conv_ids),
            pa.array(turn_idxs, type=pa.int32()),
            pa.array(roles),
            pa.array(texts),
            pa.array(tools),
            pa.array(tss, type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def write_synthetic_corpus(
    path: str, num_turns: int, seed: int = 42, rows_per_file: int = 100_000
) -> str:
    """Write a deterministic synthetic transcript corpus as multi-file
    Parquet (one file per shard => parallel read at bench time)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    shard = 0
    for start in range(0, num_turns, rows_per_file):
        n = min(rows_per_file, num_turns - start)
        t = generate_transcripts(n, seed=seed + shard)
        # re-key conv ids so shards don't collide
        conv = pc.binary_join_element_wise(
            pa.array([f"s{shard:03d}-"] * len(t)), t["conv_id"].combine_chunks(), ""
        )
        t = t.set_column(0, "conv_id", conv)
        pq.write_table(t, os.path.join(path, f"part-{shard:05d}.parquet"))
        shard += 1
    return path

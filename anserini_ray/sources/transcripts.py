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
    """Deterministic synthetic transcripts (vectorized sampling; ~1M turns/s
    generation). Coverage: empty/whitespace docs, Zipfian common vocab, a hot
    term in ~50% of turns, stopwords, analyzer spice (possessives, mixed
    case, punctuation, numbers), rare singleton-ish terms, duplicated texts
    (score-tie docid-break path)."""
    rng = np.random.default_rng(seed)
    n = num_turns
    idx = np.arange(n, dtype=np.int64)
    conv_ids = np.char.add(
        "conv-", np.char.zfill((idx // TURNS_PER_CONV).astype(str), 6)
    )
    turn_idxs = (idx % TURNS_PER_CONV).astype(np.int32)
    roles = np.asarray(_ROLES, dtype=object)[idx % 4]
    tools = np.where(idx % 4 == 2, "search", "")
    tss = 1767225600_000000 + idx * 1_000_000

    zipf_p = 1.0 / np.arange(1, len(_COMMON) + 1)
    zipf_p /= zipf_p.sum()
    lens = rng.integers(3, 40, size=n)
    r_empty = rng.random(n)
    is_empty = r_empty < empty_frac
    add_hot = rng.random(n) < 0.5
    add_stop = rng.random(n) < 0.3
    add_spice = rng.random(n) < 0.15
    add_rare = rng.random(n) < 0.1
    dup_of = np.where(rng.random(n) < 0.02, rng.integers(0, np.maximum(idx, 1)), -1)
    stop_pick = rng.integers(0, len(_STOPS), size=n)
    spice_pick = rng.integers(0, len(_SPICE), size=n)
    rare_pick = rng.integers(0, len(_RARE), size=n)

    flat = rng.choice(np.asarray(_COMMON, dtype=object), size=int(lens.sum()), p=zipf_p)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts: list[str] = []
    for i in range(n):
        if is_empty[i]:
            texts.append("" if r_empty[i] < empty_frac / 2 else "   ")
            continue
        if dup_of[i] >= 0 and dup_of[i] < len(texts):
            texts.append(texts[dup_of[i]])
            continue
        parts = flat[offs[i] : offs[i + 1]].tolist()
        if add_hot[i]:
            parts.append(HOT_TERM)
        if add_stop[i]:
            parts.append(_STOPS[stop_pick[i]])
        if add_spice[i]:
            parts.append(_SPICE[spice_pick[i]])
        if add_rare[i]:
            parts.append(_RARE[rare_pick[i]])
        texts.append(" ".join(parts))
    return pa.Table.from_arrays(
        [
            pa.array(conv_ids.tolist()),
            pa.array(turn_idxs, type=pa.int32()),
            pa.array(roles.tolist()),
            pa.array(texts),
            pa.array(tools.tolist()),
            pa.array(tss, type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def generate_zipf_transcripts(
    num_turns: int,
    vocab_size: int = 500_000,
    s: float = 1.0,
    seed: int = 77,
    min_len: int = 3,
    max_len: int = 60,
) -> pa.Table:
    """Zipfian-vocabulary transcripts for realistic pruning/vocab benchmarks:
    terms 't<rank>' drawn from a rank^-s law over `vocab_size` terms. The
    34-term default corpus gives block-max pruning nothing to prune; this is
    the corpus the MaxScore/WAND path is validated and measured on."""
    rng = np.random.default_rng(seed)
    n = num_turns
    idx = np.arange(n, dtype=np.int64)
    conv_ids = np.char.add(
        "conv-", np.char.zfill((idx // TURNS_PER_CONV).astype(str), 6)
    )
    turn_idxs = (idx % TURNS_PER_CONV).astype(np.int32)
    roles = np.asarray(_ROLES, dtype=object)[idx % 4]
    tools = np.where(idx % 4 == 2, "search", "")
    tss = 1767225600_000000 + idx * 1_000_000

    probs = 1.0 / np.power(np.arange(1, vocab_size + 1, dtype=np.float64), s)
    cum = np.cumsum(probs)
    cum /= cum[-1]
    lens = rng.integers(min_len, max_len + 1, size=n)
    total = int(lens.sum())
    ranks = np.searchsorted(cum, rng.random(total), side="left")
    vocab = np.char.add("t", np.char.zfill(ranks.astype(str), 7))
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [
        " ".join(vocab[offs[i] : offs[i + 1]].tolist()) for i in range(n)
    ]
    return pa.Table.from_arrays(
        [
            pa.array(conv_ids.tolist()),
            pa.array(turn_idxs, type=pa.int32()),
            pa.array(roles.tolist()),
            pa.array(texts),
            pa.array(tools.tolist()),
            pa.array(tss, type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def _write_zipf_shard(args) -> str:
    path, shard, n, seed, vocab_size, s = args
    import os

    import pyarrow.parquet as pq

    t = generate_zipf_transcripts(n, vocab_size=vocab_size, s=s,
                                  seed=seed + shard)
    conv = pc.binary_join_element_wise(
        pa.array([f"s{shard:04d}-"] * len(t)), t["conv_id"].combine_chunks(), ""
    )
    t = t.set_column(0, "conv_id", conv)
    out = os.path.join(path, f"part-{shard:05d}.parquet")
    pq.write_table(t, out, row_group_size=8192)
    return out


def write_zipf_corpus(
    path: str,
    num_turns: int,
    vocab_size: int = 500_000,
    s: float = 1.0,
    seed: int = 77,
    rows_per_file: int = 100_000,
) -> str:
    """Multi-file Zipfian-vocabulary corpus (see generate_zipf_transcripts);
    seed-deterministic, shards generated in parallel processes."""
    import os
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(path, exist_ok=True)
    jobs = []
    shard = 0
    for start in range(0, num_turns, rows_per_file):
        jobs.append(
            (path, shard, min(rows_per_file, num_turns - start), seed,
             vocab_size, s)
        )
        shard += 1
    if len(jobs) <= 1:
        for j in jobs:
            _write_zipf_shard(j)
        return path
    workers = min(16, os.cpu_count() or 4, len(jobs))
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_write_zipf_shard, jobs))
    return path


def _write_shard(args) -> str:
    path, shard, n, seed = args
    import os

    import pyarrow.parquet as pq

    t = generate_transcripts(n, seed=seed + shard)
    # re-key conv ids so shards don't collide (and file order == conv order)
    conv = pc.binary_join_element_wise(
        pa.array([f"s{shard:04d}-"] * len(t)), t["conv_id"].combine_chunks(), ""
    )
    t = t.set_column(0, "conv_id", conv)
    out = os.path.join(path, f"part-{shard:05d}.parquet")
    pq.write_table(
        t, out,
        row_group_size=8192,  # small row groups => read-side block splitting
    )
    return out


def write_synthetic_corpus(
    path: str, num_turns: int, seed: int = 42, rows_per_file: int = 100_000
) -> str:
    """Write a deterministic synthetic transcript corpus as multi-file
    Parquet (one file per shard => parallel read at bench time). Shards are
    generated in parallel processes; output is seed-deterministic."""
    import os
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(path, exist_ok=True)
    jobs = []
    shard = 0
    for start in range(0, num_turns, rows_per_file):
        jobs.append((path, shard, min(rows_per_file, num_turns - start), seed))
        shard += 1
    if len(jobs) <= 1:
        for j in jobs:
            _write_shard(j)
        return path
    workers = min(16, os.cpu_count() or 4, len(jobs))
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_write_shard, jobs))
    return path

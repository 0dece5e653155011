"""Corpus-level training-data operators: benchmark decontamination and
deterministic dataset splits.

Both are broadcast/map-only stages — the natural Ray Data shape at 100 TB:
no shuffle, the small side (benchmark shingle set) is `ray.put` once and
read inside every task, and the split is a pure rowwise hash.

- decontaminate: flag documents sharing >= `min_overlap` word-shingles with
  a benchmark/eval corpus (the standard n-gram decontamination used for LLM
  training sets; e.g. GPT-3 App. C / PaLM-style 13-gram checks — n is a
  parameter, smaller here because the synthetic docs are short).
- hash_split: deterministic md5(doc_id)-based train/val/test assignment,
  reproducible across runs/cluster sizes and SQL-mirrorable
  (CAST('0x' || substr(md5(id),1,2) AS INT) % 100).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .dedup import word_shingles


def benchmark_shingles(texts: list[str], n: int = 3) -> frozenset[str]:
    """The blocklist side: union of word n-gram shingles over the benchmark
    texts (small — fits the object store as one broadcast value)."""
    out: set[str] = set()
    for t in texts:
        out |= word_shingles(t or "", n)
    return frozenset(out)


def decontaminate(
    ds,
    benchmark_texts: list[str],
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-doc contamination check against a benchmark corpus.

    Returns a Dataset (id, n_overlap, contaminated) — one row per input doc.
    The benchmark shingle set is broadcast once (`ray.put`); each batch
    computes its docs' shingle overlap vectorized-per-doc with set
    intersection (shingle sets are tiny relative to the broadcast)."""
    bench_ref = ray.put(benchmark_shingles(benchmark_texts, n))

    def check(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        overlaps = np.empty(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            overlaps[i] = len(word_shingles(t or "", n) & bench)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_overlap": pa.array(overlaps),
                "contaminated": pa.array(overlaps >= min_overlap),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


def pack_sequences(
    ds,
    budget: int = 512,
    group_size: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Greedy fixed-token-budget sequence packing — the standard LLM
    training-data step of concatenating documents into budget-sized
    sequences.

    Deterministic distributed contract: documents pack greedily in id order
    WITHIN fixed id-range groups (group = id // group_size), so sequences
    never span groups and the assignment is independent of batch/partition
    boundaries (each map task covers whole groups by construction when the
    input is id-partitioned; here token counting is a narrow map and the
    greedy scan runs per group). A document longer than the budget gets its
    own sequence. Returns (id, pack_group, seq_idx, n_tokens): seq_idx is
    the sequence number within the group."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = np.fromiter(
            (len((t or "").split()) for t in batch[text_col].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        ids = np.asarray(batch[id_col].to_pylist())
        return pa.table(
            {
                id_col: batch[id_col],
                "pack_group": pa.array(
                    (ids.astype(np.int64) // group_size).astype(np.int64)
                ),
                "n_tokens": pa.array(n),
            }
        )

    counted = ds.map_batches(count_tokens, batch_format="pyarrow")

    def pack_group(group: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(group[id_col].to_pylist()), kind="stable")
        g = group.take(pa.array(order))
        toks = g["n_tokens"].to_numpy()
        seq_idx = np.empty(len(toks), dtype=np.int64)
        cur = 0
        acc = 0
        for i, t in enumerate(toks):
            if i > 0 and acc + t > budget:
                cur += 1
                acc = 0
            acc += int(t)
            seq_idx[i] = cur
        return pa.table(
            {
                id_col: g[id_col],
                "pack_group": g["pack_group"],
                "seq_idx": pa.array(seq_idx),
                "n_tokens": g["n_tokens"],
            }
        )

    return counted.groupby("pack_group").map_groups(
        pack_group, batch_format="pyarrow"
    )


SPLIT_NAMES = ("train", "val", "test")


def hash_split(
    ds,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (80, 10, 10),
):
    """Deterministic split assignment: bucket = first TWO md5 bytes of the
    id string (big-endian) mod 100 — two bytes, not one, so the modulo bias
    is 1/65536 rather than the 2-vs-3-in-256 skew a single byte gives.
    Train gets [0, w0), val [w0, w0+w1), test the rest. Pure rowwise map —
    reproducible across runs, cluster sizes and engines (the SQL mirror is
    CAST('0x' || substr(md5(id), 1, 4) AS INTEGER) % 100)."""
    w0, w1, w2 = weights
    if w0 + w1 + w2 != 100:
        raise ValueError("weights must sum to 100")

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        buckets = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:2], 'big') % 100
             for i in ids),
            dtype=np.int64,
            count=len(ids),
        )
        split = np.where(
            buckets < w0, "train", np.where(buckets < w0 + w1, "val", "test")
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(buckets),
                "split": pa.array(split.tolist()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")

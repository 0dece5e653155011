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

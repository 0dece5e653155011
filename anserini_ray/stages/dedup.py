"""Deduplication operators for large-scale training-data pipelines.

The reference's only dedup is exact last-write-wins by docid
(`J/index/IndexCollection.java:213-217`, `-uniqueDocid`); the rest are the
standard web-scale techniques added as first-class Ray Data stages:

- exact_dedup           hash-partitioned exact text dedup (groupby on a
                        64-bit content hash, representative = min doc_id)
- unique_by_key         last/first-wins upsert by key (the `-uniqueDocid`
                        analog, generalized)
- minhash_lsh_dedup     word-shingle MinHash signatures → banded LSH
                        bucketing (groupby on band hash) → candidate groups
                        → exact n-gram-Jaccard verification
- simhash_dedup         64-bit SimHash + hamming-ball blocking (4-band exact
                        match covers hamming distance <= 3)
- ngram_jaccard         exact Jaccard similarity between shingle sets

All stages are map_batches (vectorized or dict-based per batch) plus ONE
groupby shuffle keyed on a fixed-width hash — the scalable shape: content
never shuffles, only (hash, id) pairs and, for verified pairs, shingle sets
of candidate groups (tiny unless the corpus is mostly duplicates).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min

# ------------------------------------------------------------------ hashing

def _sha1_64(s: str) -> int:
    return struct.unpack("<q", hashlib.sha1(s.encode()).digest()[:8])[0]


def _hash_tokens_64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes per token (stable across processes)."""
    return np.fromiter(
        (_sha1_64(t) for t in tokens), dtype=np.int64, count=len(tokens)
    )


# MinHash via universal hashing of base shingle hashes:
#   h_i(x) = (a_i * x + b_i) mod p  over a 61-bit Mersenne prime.
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 1337):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def word_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def minhash_signature(
    shingles: set[str], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    if not shingles:
        return np.full(a.size, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = _hash_tokens_64(sorted(shingles)).astype(np.uint64) & np.uint64(
        _MERSENNE
    )
    # (num_perm, n_shingles) universal hash, min over shingles
    prod = (
        a.astype(np.uint64)[:, None] * base[None, :] + b.astype(np.uint64)[:, None]
    ) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa, sb = word_shingles(text_a, n), word_shingles(text_b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


# ------------------------------------------------------------- exact dedup

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Groups of identical texts: one row per distinct text with the
    representative (min id) and the duplicate count. SQL mirror:
    SELECT min(id), count(*) FROM t GROUP BY text."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = pa.array(
            [_sha1_64(t or "") for t in batch[text_col].to_pylist()],
            type=pa.int64(),
        )
        return pa.Table.from_arrays(
            [hashes, batch[id_col]], names=["text_hash", id_col]
        )

    agg = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min(id_col), Count())
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch[f"min({id_col})"], batch["count()"]],
            names=["rep_doc_id", "dup_count"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def unique_by_key(ds, key_cols: list[str], order_col: str, keep: str = "last"):
    """Upsert semantics: keep one row per key — `keep="last"` mirrors the
    reference's `writer.updateDocument` last-write-wins
    (`IndexCollection.java:213-217`)."""

    def pick(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group[order_col])
        i = order[len(order) - 1].as_py() if keep == "last" else order[0].as_py()
        return group.slice(i, 1)

    return ds.groupby(key_cols).map_groups(pick, batch_format="pyarrow")


# ----------------------------------------------------------- MinHash + LSH

def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    verify: bool = True,
):
    """Near-duplicate groups via MinHash + banded LSH.

    Stages: map_batches signatures (stateful perm params, vectorized) →
    flat emit (band_id, band_hash, id) → groupby band bucket → candidate
    groups (>=2 members) → optional exact-Jaccard verification pass that
    re-derives shingles only for candidate docs (broadcast candidate-id set).
    Returns a Dataset of (band_id, band_hash, doc_ids list, pair rows with
    jaccard) — flattened as (doc_a, doc_b, jaccard) pairs when verify=True,
    else (band_id, band_hash, doc_ids)."""
    a, b = _perm_params(num_perm)
    rows = num_perm // bands

    def signatures(batch: pa.Table) -> pa.Table:
        out_band, out_hash, out_id = [], [], []
        ids = batch[id_col].to_pylist()
        for did, text in zip(ids, batch[text_col].to_pylist()):
            sig = minhash_signature(word_shingles(text or "", shingle_n), a, b)
            for band in range(bands):
                band_sig = sig[band * rows : (band + 1) * rows]
                h = hash(band_sig.tobytes())  # in-process only → re-hash:
                h = _sha1_64(band_sig.tobytes().hex())
                out_band.append(band)
                out_hash.append(h)
                out_id.append(did)
        return pa.Table.from_arrays(
            [
                pa.array(out_band, type=pa.int32()),
                pa.array(out_hash, type=pa.int64()),
                pa.array(out_id),
            ],
            names=["band_id", "band_hash", id_col],
        )

    buckets = ds.map_batches(signatures, batch_format="pyarrow")

    def bucket_groups(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.Table.from_arrays(
                [
                    pa.array([], type=pa.int32()),
                    pa.array([], type=pa.int64()),
                    pa.array([], type=pa.list_(group[id_col].type)),
                ],
                names=["band_id", "band_hash", "doc_ids"],
            )
        ids = sorted(group[id_col].to_pylist())
        return pa.Table.from_arrays(
            [
                group["band_id"].slice(0, 1),
                group["band_hash"].slice(0, 1),
                pa.array([ids]),
            ],
            names=["band_id", "band_hash", "doc_ids"],
        )

    groups = buckets.groupby(["band_id", "band_hash"]).map_groups(
        bucket_groups, batch_format="pyarrow"
    )
    if not verify:
        return groups

    # Exact verification: candidate ids -> fetch texts -> pairwise jaccard.
    # Candidate sets are small relative to the corpus; the text fetch is a
    # broadcast-filter scan, not a shuffle.
    group_rows = groups.take_all()
    cand_pairs: set[tuple] = set()
    for r in group_rows:
        ids = r["doc_ids"]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand_pairs.add((ids[i], ids[j]))
    cand_ids = sorted({x for p in cand_pairs for x in p})
    id_set = set(cand_ids)

    def grab(batch: pa.Table) -> pa.Table:
        mask = pa.array([i in id_set for i in batch[id_col].to_pylist()])
        sub = batch.filter(mask)
        return pa.Table.from_arrays(
            [sub[id_col], sub[text_col]], names=[id_col, text_col]
        )

    texts = {
        r[id_col]: r[text_col]
        for r in ds.map_batches(grab, batch_format="pyarrow").take_all()
    }
    out_a, out_b, out_j = [], [], []
    for da, db in sorted(cand_pairs):
        j = ngram_jaccard(texts.get(da, "") or "", texts.get(db, "") or "", shingle_n)
        if j >= threshold:
            out_a.append(da)
            out_b.append(db)
            out_j.append(j)
    return pa.table(
        {
            "doc_a": out_a,
            "doc_b": out_b,
            "jaccard": pa.array(out_j, type=pa.float64()),
        }
    )


# ----------------------------------------------------------------- SimHash

def simhash64(tokens: list[str]) -> int:
    if not tokens:
        return 0
    hashes = _hash_tokens_64(tokens).astype(np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return int(
        np.bitwise_or.reduce(
            (v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """SimHash near-dup candidates: 64-bit simhash split into 4 x 16-bit
    bands; docs sharing any band are candidates (covers hamming<=3 exactly).
    Returns (band_id, band_val, doc_ids list) groups with >= 2 members."""

    def sig(batch: pa.Table) -> pa.Table:
        out_band, out_val, out_id = [], [], []
        for did, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            h = simhash64((text or "").lower().split())
            for band in range(4):
                out_band.append(band)
                out_val.append((h >> (16 * band)) & 0xFFFF)
                out_id.append(did)
        return pa.Table.from_arrays(
            [
                pa.array(out_band, type=pa.int32()),
                pa.array(out_val, type=pa.int64()),
                pa.array(out_id),
            ],
            names=["band_id", "band_val", id_col],
        )

    def bucket_groups(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.Table.from_arrays(
                [
                    pa.array([], type=pa.int32()),
                    pa.array([], type=pa.int64()),
                    pa.array([], type=pa.list_(group[id_col].type)),
                ],
                names=["band_id", "band_val", "doc_ids"],
            )
        ids = sorted(group[id_col].to_pylist())
        return pa.Table.from_arrays(
            [
                group["band_id"].slice(0, 1),
                group["band_val"].slice(0, 1),
                pa.array([ids]),
            ],
            names=["band_id", "band_val", "doc_ids"],
        )

    return (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(bucket_groups, batch_format="pyarrow")
    )

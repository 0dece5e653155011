"""Mergeable heavy-hitter sketch (Misra–Gries) over corpus n-grams.

The exact corpus n-gram count (`pipelines/training_data.ngram_counts`)
ships every distinct partial gram through one wide hash aggregate — right
when you need exact counts, but at 100 TB the partial vocabulary itself is
huge. The Misra–Gries summary (Misra & Gries 1982; mergeability per
Agarwal et al., "Mergeable Summaries", PODS 2012) caps every intermediate
at `capacity` rows with the classic guarantee over the whole corpus:

  * every gram with true count > N / (capacity + 1) is reported, and
  * for reported grams:  est <= true <= est + N / (capacity + 1)

where N = total n-gram occurrences. Physical shape: per-block MG summaries
(bounded dicts) -> repartition to `merge_tasks` -> per-partition MG merge
(vectorized group-sum + (capacity+1)-th-largest subtraction) -> driver
merge of `merge_tasks` bounded summaries. Nothing corpus-proportional
moves after the first map; add tree levels for more blocks.

With capacity >= distinct grams no counter is ever decremented and the
sketch is exact — the degenerate-exact configuration used for the DuckDB
oracle (same pattern as the LSH/IVF ANN oracles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["mg_update", "mg_merge_tables", "heavy_hitters"]

# sentinel column layout for summary rows: (gram: string|null, n: int64);
# the single null-gram row per summary carries that summary's observed
# item total N (needed for the error bound; not derivable from counters).


def mg_update(counters: dict, items, capacity: int) -> int:
    """Streaming Misra–Gries update; returns number of items consumed.

    Reference semantics only (property tests compare against it) — the
    pipeline's per-block stage uses the vectorized `_batch_summary` instead:
    an EXACT per-batch count table is itself a valid MG summary (zero error
    accrued), and `mg_merge_tables`' (capacity+1)-th-largest subtraction is
    the proven compression back to capacity rows, so guarantees are
    unchanged while the per-token Python loop disappears."""
    n = 0
    for it in items:
        n += 1
        if it in counters:
            counters[it] += 1
        elif len(counters) < capacity:
            counters[it] = 1
        else:
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return n


def _ngram_array(texts, n: int) -> pa.Array:
    """All word n-grams of a batch's text column, vectorized: Unicode
    lower + whitespace split (Arrow kernels), flatten with doc provenance,
    slide n element-wise-joined slices, mask grams that cross a document
    boundary. Matches ``(t or '').lower().split()`` n-gram semantics."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(texts, "")))
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # split_whitespace emits empty tokens at string edges; Python split()
    # drops them
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    doc_idx = doc_idx[keep_np]
    L = len(flat)
    if L < n:
        return pa.array([], type=pa.string())
    m = L - n + 1
    grams = pc.binary_join_element_wise(
        *(flat.slice(j, m) for j in range(n)), " "
    )
    valid = doc_idx[:m] == doc_idx[n - 1:]
    return grams.filter(pa.array(valid))


def _batch_summary(texts, n: int, capacity: int) -> pa.Table:
    """Vectorized per-block MG summary: exact n-gram counts via a hash
    aggregate over this block only (never corpus-wide), compressed to
    `capacity` rows by the mergeable-summaries subtraction rule.

    Gram strings are NOT materialized per occurrence: tokens are
    dictionary-encoded once, each n-gram becomes a packed int64 key
    (base-V positional code), the group_by runs on int64, and only the
    <= capacity SURVIVING grams get decoded back to strings — on a 3.9M
    token block this is ~5x the joined-string group_by and ~11x the
    per-token Python MG loop it replaces."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(pc.fill_null(texts, "")))
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    doc_idx = doc_idx[keep_np]
    L = len(flat)
    if L < n:
        return _summary_table({}, 0)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary
    V = len(vocab)
    ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    m = L - n + 1
    if V ** n < 2**62:
        key = ids[:m].copy()
        for j in range(1, n):
            key *= V
            key += ids[j: j + m]
        valid = doc_idx[:m] == doc_idx[n - 1:]
        key = key[valid]
        total = int(valid.sum())
        agg = (
            pa.table({"k": pa.array(key, type=pa.int64())})
            .group_by("k")
            .aggregate([("k", "count")])
        )
        keys = agg["k"].to_numpy(zero_copy_only=False)
        counts = agg["k_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(counts) > capacity:
            kth = np.partition(counts, len(counts) - (capacity + 1))[
                len(counts) - (capacity + 1)
            ]
            sel = counts > kth
            keys, counts = keys[sel], counts[sel] - kth
        # decode ONLY the survivors (<= capacity) back to gram strings
        parts = []
        rem = keys.copy()
        for _ in range(n):
            parts.append(rem % V)
            rem //= V
        toks_dec = [
            vocab.take(pa.array(p, type=pa.int64()))
            for p in reversed(parts)
        ]
        grams = (
            pc.binary_join_element_wise(*toks_dec, " ")
            if len(toks_dec) > 1
            else toks_dec[0]
        )
        return pa.table(
            {
                "gram": pa.concat_arrays(
                    [
                        grams.combine_chunks()
                        if isinstance(grams, pa.ChunkedArray)
                        else grams,
                        pa.array([None], type=pa.string()),
                    ]
                ),
                "n": pa.array(
                    np.concatenate([counts, [total]]), type=pa.int64()
                ),
            }
        )
    # huge-vocab / large-n fallback: packed keys would overflow int64 —
    # group on the joined gram strings instead (same result, more bytes)
    grams = pc.binary_join_element_wise(
        *(flat.slice(j, m) for j in range(n)), " "
    ).filter(pa.array(doc_idx[:m] == doc_idx[n - 1:]))
    total = len(grams)
    agg = (
        pa.table({"gram": grams})
        .group_by("gram")
        .aggregate([("gram", "count")])
    )
    summary = pa.table(
        {
            "gram": pa.concat_arrays(
                [
                    agg["gram"].combine_chunks().cast(pa.string()),
                    pa.array([None], type=pa.string()),
                ]
            ),
            "n": pa.concat_arrays(
                [
                    agg["gram_count"].combine_chunks().cast(pa.int64()),
                    pa.array([total], type=pa.int64()),
                ]
            ),
        }
    )
    return mg_merge_tables(summary, capacity)


def _summary_table(counters: dict, n_items: int) -> pa.Table:
    grams = list(counters.keys()) + [None]
    counts = list(counters.values()) + [n_items]
    return pa.table(
        {
            "gram": pa.array(grams, type=pa.string()),
            "n": pa.array(counts, type=pa.int64()),
        }
    )


def mg_merge_tables(batch: pa.Table, capacity: int) -> pa.Table:
    """Merge concatenated MG summaries: group-sum per gram, then subtract
    the (capacity+1)-th largest count and drop non-positives (the proven
    mergeable-summaries rule). Null-gram N rows sum through."""
    agg = batch.group_by("gram").aggregate([("n", "sum")])
    grams = agg["gram"]
    counts = agg["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    null_mask = grams.is_null().to_numpy(zero_copy_only=False)
    n_items = int(counts[null_mask].sum()) if null_mask.any() else 0
    g_counts = counts[~null_mask]
    g_grams = grams.filter(pa.array(~null_mask))
    if len(g_counts) > capacity:
        # subtract the (capacity+1)-th largest; strictly larger survive
        kth = np.partition(g_counts, len(g_counts) - (capacity + 1))[
            len(g_counts) - (capacity + 1)
        ]
        keep = g_counts > kth
        g_grams = g_grams.filter(pa.array(keep))
        g_counts = g_counts[keep] - kth
    # summaries are capacity-bounded: list-level assembly is O(capacity)
    return pa.table(
        {
            "gram": pa.array(g_grams.to_pylist() + [None], type=pa.string()),
            "n": pa.array(
                np.concatenate([g_counts, [n_items]]), type=pa.int64()
            ),
        }
    )


def heavy_hitters(
    ds,
    *,
    text_col: str = "text",
    n: int = 2,
    capacity: int = 4096,
    k: int = 100,
    merge_tasks: int = 16,
):
    """Top-k heavy-hitter word n-grams with Misra–Gries guarantees.
    Returns a pa.Table (gram, est_count, max_count, n_total) sorted
    (est_count desc, gram asc), est <= true <= max = est + N/(capacity+1).
    """

    def partial(batch: pa.Table) -> pa.Table:
        return _batch_summary(batch[text_col], n, capacity)

    def merge(batch: pa.Table) -> pa.Table:
        return mg_merge_tables(batch, capacity)

    summaries = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(merge_tasks)
        .map_batches(merge, batch_format="pyarrow")
    )
    # driver-final merge: merge_tasks bounded summaries (<= tasks*(cap+1) rows)
    parts = [b for b in summaries.iter_batches(batch_format="pyarrow")]
    if not parts:
        parts = [
            pa.table(
                {
                    "gram": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        ]
    final = mg_merge_tables(pa.concat_tables(parts), capacity)
    counts = final["n"].to_numpy(zero_copy_only=False)
    null_mask = final["gram"].is_null().to_numpy(zero_copy_only=False)
    n_total = int(counts[null_mask].sum())
    err = n_total // (capacity + 1)
    grams = final["gram"].filter(pa.array(~null_mask)).to_pylist()
    est = counts[~null_mask]
    order = sorted(range(len(grams)), key=lambda i: (-est[i], grams[i]))[:k]
    return pa.table(
        {
            "gram": pa.array([grams[i] for i in order], type=pa.string()),
            "est_count": pa.array([int(est[i]) for i in order], type=pa.int64()),
            "max_count": pa.array(
                [int(est[i]) + err for i in order], type=pa.int64()
            ),
            "n_total": pa.array([n_total] * len(order), type=pa.int64()),
        }
    )

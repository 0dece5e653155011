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
    """Streaming Misra–Gries update; returns number of items consumed."""
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
        counters: dict = {}
        total = 0
        for t in batch[text_col].to_pylist():
            toks = (t or "").lower().split()
            total += mg_update(
                counters,
                (" ".join(toks[j: j + n]) for j in range(len(toks) - n + 1)),
                capacity,
            )
        return _summary_table(counters, total)

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

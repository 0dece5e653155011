"""Arrow-kernel hash aggregation — the scalable replacement for Ray Data's
sort-based groupby on string/composite keys.

Shape: per-block pyarrow `Table.group_by` (C++ hash aggregate — the
combiner), then an explicit crc32-of-key hash partition, then one merge
task per partition that concatenates its sub-tables and hash-aggregates
again with the MERGE functions (sum-of-counts, sum-of-sums, min-of-mins,
max-of-maxs). Only pre-combined rows ever move; reducer fan-in is bounded
by the partition count. Measured ~20x faster than `Dataset.groupby` on a
600K-row 500K-distinct-key skinny table (see BASELINE.md round 3);
`index/build._hash_agg_term_stats` is the index-build instantiation.

Supported aggs: ("count", None) plus ("sum"|"min"|"max", col).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

_MERGE_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def _agg_lists(keys, aggs, out_names, for_merge: bool):
    """(pyarrow agg spec, produced column names) for the local or merge
    pass. After the local pass the table has columns keys + out_names, so
    the merge pass aggregates out_names with the merge fn."""
    spec = []
    if for_merge:
        for name, (fn, _col) in zip(out_names, aggs):
            spec.append((name, _MERGE_FN[fn]))
        produced = [f"{n}_{_MERGE_FN[f[0]]}" for n, f in zip(out_names, aggs)]
    else:
        for fn, col in aggs:
            spec.append(([], "count_all") if fn == "count" else (col, fn))
        produced = [
            "count_all" if fn == "count" else f"{col}_{fn}"
            for fn, col in aggs
        ]
    return spec, produced


def _key_hash(table: pa.Table, keys: list[str], nparts: int) -> np.ndarray:
    cols = [table[k].to_pylist() for k in keys]
    return np.fromiter(
        (
            zlib.crc32("\x1f".join(map(str, row)).encode()) % nparts
            for row in zip(*cols)
        ),
        dtype=np.int64,
        count=table.num_rows,
    )


@ray.remote
def _merge_partition(keys, aggs, out_names, *tables: pa.Table) -> pa.Table:
    parts = [t for t in tables if t.num_rows]
    if not parts:
        first = tables[0]
        return first.slice(0, 0)
    spec, produced = _agg_lists(keys, aggs, out_names, for_merge=True)
    merged = pa.concat_tables(parts).group_by(keys).aggregate(spec)
    return merged.select(keys + produced).rename_columns(keys + out_names)


def hash_aggregate(
    ds,
    keys: list[str],
    aggs: list[tuple[str, str | None]],
    out_names: list[str],
    nparts: int | None = None,
):
    """Distributed hash aggregate of a Dataset.

    aggs: list of (fn, col) with fn in count|sum|min|max (col=None for
    count). out_names: result column name per agg. Returns a Dataset with
    columns keys + out_names.

    Shape: a streaming map_batches PRE-COMBINE runs inside the input
    pipeline (so what gets materialized is key-cardinality-bounded per
    block, never raw rows), then per-block partitioning + per-partition
    merge tasks using the merge functions."""

    def precombine(batch: pa.Table) -> pa.Table:
        spec, produced = _agg_lists(keys, aggs, out_names, for_merge=False)
        agg = batch.select(
            keys + sorted({c for _, c in aggs if c})
        ).group_by(keys).aggregate(spec)
        return agg.select(keys + produced).rename_columns(keys + out_names)

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = nparts or max(2, min(32, cpus))
    mat = ds.map_batches(precombine, batch_format="pyarrow").materialize()
    refs = mat.to_arrow_refs()
    per_block = [
        _partition_combined.options(num_returns=nparts).remote(
            r, keys, aggs, out_names, nparts
        )
        for r in refs
    ]
    merged = [
        _merge_partition.remote(
            keys, aggs, out_names, *[blk[p] for blk in per_block]
        )
        for p in range(nparts)
    ]
    return ray.data.from_arrow_refs(merged)


@ray.remote
def _partition_combined(
    table: pa.Table, keys: list[str], aggs, out_names, nparts: int
) -> list[pa.Table]:
    """Partition an already-pre-combined block by crc32(keys) — combining
    again with the MERGE functions first (a block may span multiple input
    batches)."""
    spec, produced = _agg_lists(keys, aggs, out_names, for_merge=True)
    agg = (
        table.group_by(keys)
        .aggregate(spec)
        .select(keys + produced)
        .rename_columns(keys + out_names)
    )
    part = _key_hash(agg, keys, nparts)
    order = np.argsort(part, kind="stable")
    s = agg.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(nparts + 1))
    return [
        s.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(nparts)
    ]

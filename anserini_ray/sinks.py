"""Resumable partitioned-parquet sink for map-only corpus transforms.

At 100 TB a transform job WILL be preempted; output must be partitioned so a
re-run skips finished work instead of recomputing everything. The inverted
index already has unit-granular resume (index/streaming.py lineage markers);
this is the same idea for the flat corpus ops (PII redaction, quality
filtering, chunking, fingerprinting, ...): ONE output partition per input
shard, written atomically (tmp + rename), existence == done.

This is deliberately raw Ray tasks, not a Dataset pipeline: resumability
needs a deterministic input-shard → output-partition mapping, which
`Dataset.write_parquet` does not expose (its file naming depends on runtime
block splits). Each task is still a vectorized Arrow read → transform →
write over one shard; parallelism = pending shards, scheduled by Ray across
the cluster exactly like Dataset tasks would be.
"""

from __future__ import annotations

import os
from typing import Callable

import pyarrow as pa

__all__ = ["resumable_transform_write", "pending_partitions"]


def _part_name(i: int, path: str) -> str:
    base = os.path.splitext(os.path.basename(path))[0]
    return f"part-{i:05d}-{base}.parquet"


def pending_partitions(
    input_paths: list, out_dir: str
) -> list[tuple[int, str, str]]:
    """(index, input_path, output_path) for shards whose output partition
    does not exist yet."""
    out = []
    for i, p in enumerate(input_paths):
        dst = os.path.join(out_dir, _part_name(i, p))
        if not os.path.exists(dst):
            out.append((i, p, dst))
    return out


def resumable_transform_write(
    input_paths: list,
    transform_factory: Callable[[], Callable[[pa.Table], pa.Table]],
    out_dir: str,
    *,
    columns: list | None = None,
    batch_rows: int = 65_536,
    num_cpus: float = 1.0,
    row_group_size: int = 65_536,
) -> dict:
    """Apply a batch transform (pa.Table -> pa.Table) to every input shard,
    writing one parquet partition per shard. Finished partitions (output
    file exists) are skipped, so a preempted run resumes where it stopped;
    in-flight writes go to a tmp path and rename into place, so a crash
    never leaves a partial partition behind.

    transform_factory is a zero-arg constructor run ONCE per task (per
    shard) — stateful setup (compiled regexes, analyzers, models) amortizes
    over the shard's batches, mirroring the actor-pool __init__ pattern.

    Returns {"n_shards", "n_skipped", "n_written", "rows_out"}.
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    todo = pending_partitions(input_paths, out_dir)
    # Reclaim tmp files orphaned by SIGKILLed workers of a previous run:
    # their pids differ from this run's, so the writing task's own finally
    # never sees them — without this sweep they'd accumulate in out_dir
    # indefinitely. Swept for every partition (pending or complete); a
    # resumed run owns the whole out_dir, so any pre-existing tmp is dead.
    import glob as _glob

    for i, p in enumerate(input_paths):
        dst = os.path.join(out_dir, _part_name(i, p))
        for stale in _glob.glob(f"{dst}.tmp.*"):
            try:
                os.remove(stale)
            except OSError:
                pass

    @ray.remote(num_cpus=num_cpus)
    def _one(src: str, dst: str) -> int:
        import pyarrow.parquet as pq

        fn = transform_factory()
        tmp = f"{dst}.tmp.{os.getpid()}"
        pf = pq.ParquetFile(src)
        writer = None
        rows = 0
        try:
            for rb in pf.iter_batches(batch_size=batch_rows, columns=columns):
                out = fn(pa.Table.from_batches([rb]))
                out = out.combine_chunks()
                if writer is None:
                    writer = pq.ParquetWriter(tmp, out.schema)
                writer.write_table(out, row_group_size=row_group_size)
                rows += out.num_rows
            if writer is None:  # empty shard: preserve the transformed schema
                src_empty = pf.schema_arrow.empty_table()
                if columns:
                    src_empty = src_empty.select(columns)
                empty = fn(src_empty)
                writer = pq.ParquetWriter(tmp, empty.schema)
                writer.write_table(empty)
            writer.close()
            writer = None
            os.replace(tmp, dst)  # atomic: partition exists == complete
        finally:
            if writer is not None:
                writer.close()
            if os.path.exists(tmp):
                os.remove(tmp)
        return rows

    futures = [_one.remote(src, dst) for _i, src, dst in todo]
    rows = sum(ray.get(futures)) if futures else 0
    return {
        "n_shards": len(input_paths),
        "n_skipped": len(input_paths) - len(todo),
        "n_written": len(todo),
        "rows_out": rows,
    }

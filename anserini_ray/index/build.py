"""Distributed inverted-index build — the Ray-Data-native replacement for the
reference's Lucene `IndexWriter` path (`J/index/IndexCollection.java:729-893`).

Streaming DAG:

  read_parquet(transcripts)                                  [pruned columns]
    → map_batches(TokenizeDocs)         per-doc (conv_id, turn_idx, dl,
                                         terms, tfs [, positions]);
                                         whitespace-empty docs dropped +
                                         counted, per-doc errors counted via
                                         a named counter actor (reference
                                         analog: EmptyDocumentException,
                                         DefaultLuceneDocumentGenerator.java:64-66)
    → [sort(conv_id, turn_idx)]         SKIPPED on the assume_sorted fast
                                        path (order verified block-by-block,
                                        automatic fallback); tie-break parity:
                                        results are later sorted by docid
                                        string (SearchCollection.java:115-116)
    → ordinal assignment                per-block prefix-sum offsets (driver
                                        holds ONE int per block, never rows)
    → map_batches(encode_subblocks)     explode to postings and IMMEDIATELY
                                        delta-gap + varint encode per
                                        (segment, term) run *within the
                                        batch*. Sorted blocks are disjoint
                                        contiguous ordinal ranges, so runs
                                        never overlap — hot-term skew is
                                        bounded by encode batch size by
                                        construction, with NO postings
                                        shuffle at all. Runs store their
                                        absolute first ordinal and ARE the
                                        on-disk posting format (readers
                                        concatenate a term's runs; see
                                        optimize.py for the force-merge
                                        compaction). Per-block (≤128 docs)
                                        max-tf / min-dl impact metadata for
                                        block-max pruning.
    → write_parquet(partition_cols=[segment_id])    streamed — no
                                        materialize, no sort
  + docmap  (doc_ord, conv_id, turn_idx, dl[, ts])  partitioned by segment
  + docvecs (optional forward index for PRF)        partitioned by segment
  + termstats (term, global df, global cf)          ONE sort-based
                                        groupby(term) + broadcast map-side
                                        join (hash join above a vocab cap)
  + manifests                           per-segment lineage + stage timings;
                                        resume skips finished segments.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..analysis.analyzer import make_analyzer
from ..state.manifest import (
    IndexManifest,
    SegmentManifest,
    completed_segments,
    input_fingerprint,
)
from .varint import varint_encode, varint_sizes

INDEX_FORMAT_VERSION = 2  # v2: pos_blob run column + optional ts in docmap
BLOCK_SIZE = 128  # docs per impact block (block-max metadata granularity)
BROADCAST_VOCAB_LIMIT = 2_000_000  # broadcast term stats below this; join above


@dataclass
class IndexConfig:
    seg_shift: int = 17          # docs per segment = 1 << seg_shift
    block_size: int = BLOCK_SIZE
    analyzer: dict = field(default_factory=dict)
    norm_mode: str = "lucene"    # "lucene" (byte4-quantized dl) | "accurate"
    resume: bool = False
    # Input already globally ordered by (conv_id, turn_idx)? Then the global
    # sort shuffle is skipped; ordinal assignment VERIFIES the order block by
    # block (vectorized) and the build falls back to sorting if violated.
    # Transcript corpora are typically stored in conversation order, making
    # this the common fast path — it removes the only corpus-sized shuffle.
    assume_sorted: bool = False
    # partition count for the wide groupby shuffles (None = Ray default);
    # size ≈ 2-4x total cluster cores at real scale
    shuffle_partitions: int | None = 32
    # rows per encode task (per-term runs get longer with bigger batches but
    # tasks get fewer; ~16K balances parallelism vs. sub-row count)
    encode_batch_size: int = 16384
    # also write a forward index (doc -> terms/tfs) per segment; required by
    # pseudo-relevance-feedback rerankers (RM3's reader.getTermVector analog,
    # Rm3Reranker.java:134-136)
    store_docvecs: bool = False
    # store token positions in the postings (Lucene -storePositions analog;
    # enables phrase/proximity queries; ~2x tokenized payload)
    store_positions: bool = False
    # sha1 shard filter (reference -shard.count/-shard.current,
    # IndexCollection.java:185-191): index only docids whose Guava-sha1-int
    # Java-mod shard_count equals shard_current. -1 = disabled.
    shard_count: int = -1
    shard_current: int = -1
    # Append auto-compaction threshold: after append_index_streaming, any
    # segment whose posting lists are fragmented across >= this many unit
    # writes SINCE its last compaction is force-merged in place
    # (optimize_index(segments=[...])). Head-term decode cost scales with
    # runs-per-posting-list ~= units touching the segment, so the unit
    # count is the right zero-cost fragmentation proxy (measured: see
    # BASELINE.md segment-fragmentation row). None disables the hook.
    auto_compact_unit_runs: int | None = 32

    @property
    def shard(self) -> tuple[int, int] | None:
        return (
            (self.shard_count, self.shard_current)
            if self.shard_count > 1
            else None
        )

    def repr_for_fingerprint(self) -> str:
        shard = (
            f"|shard{self.shard_count}.{self.shard_current}"
            if self.shard_count > 1
            else ""
        )
        return (
            f"v{INDEX_FORMAT_VERSION}|seg{self.seg_shift}|blk{self.block_size}"
            f"|{sorted(self.analyzer.items())}|{self.norm_mode}"
            f"|dv{int(self.store_docvecs)}|pos{int(self.store_positions)}"
            f"{shard}"
        )


_ANALYZER_CACHE: dict = {}


def _process_analyzer(analyzer_config: dict | None):
    """Per-worker-process analyzer singleton. Tokenize runs as plain TASKS
    (not an actor pool): Ray reuses warm worker processes across stages and
    datasets, so the analyzer (and its stem memo) is built once per worker —
    the same once-per-worker property as an actor pool, without paying actor
    spin-up on every build. (Reference analog: per-thread generator,
    IndexCollection.java:164-165.)"""
    key = tuple(sorted((analyzer_config or {}).items()))
    a = _ANALYZER_CACHE.get(key)
    if a is None:
        a = make_analyzer(analyzer_config)
        _ANALYZER_CACHE[key] = a
    return a


class TokenizeDocs:
    """map_batches stage (works as a task fn via TokenizeDocs(cfg) or as a
    callable class). With store_positions, also emits per-(doc, term) token
    position lists (Lucene `-storePositions` analog,
    `J/index/IndexArgs.java:69-72`) — roughly doubles the tokenized payload,
    enabling phrase/proximity queries.

    A doc whose analysis raises is DROPPED and counted, not fatal (reference
    analog: per-doc exception -> error counter, IndexCollection.java:249-251
    — except the reference loses the whole FILE; we lose one doc). Error
    counts flow through an optional named counter actor."""

    def __init__(
        self,
        analyzer_config: dict | None = None,
        store_positions: bool = False,
        error_counter_name: str | None = None,
        shard: tuple[int, int] | None = None,
    ):
        self.analyzer_config = analyzer_config
        self.store_positions = store_positions
        self.error_counter_name = error_counter_name
        self.shard = shard

    def _count_errors(self, n: int) -> None:
        if n and self.error_counter_name:
            try:
                ray.get_actor(self.error_counter_name).add.remote(n)
            except ValueError:
                pass

    def _count_skipped(self, n: int) -> None:
        if n and self.error_counter_name:
            try:
                ray.get_actor(self.error_counter_name).add_skipped.remote(n)
            except (ValueError, AttributeError):
                pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        table, _idx, n_errors, n_skipped = tokenize_table(
            batch, self.analyzer_config, self.store_positions, self.shard
        )
        self._count_errors(n_errors)
        self._count_skipped(n_skipped)
        return table


def tokenize_table(
    batch: pa.Table,
    analyzer_config: dict | None,
    store_positions: bool,
    shard: tuple[int, int] | None = None,
) -> tuple[pa.Table, np.ndarray, int, int]:
    """Core tokenize kernel: returns (tokenized table, kept original row
    indices, error count, shard-skipped count). The kept-index array lets
    callers derive deterministic ordinals from input row positions
    (streaming build). `shard=(count, current)` applies the reference's
    sha1 shard filter before analysis (skips counted separately)."""
    texts = batch["text"].to_pylist()
    n_skipped = 0
    shard_keep = None
    if shard is not None:
        from .shard import shard_mask

        ids = [
            f"{c}:{t}"
            for c, t in zip(
                batch["conv_id"].to_pylist(), batch["turn_idx"].to_pylist()
            )
        ]
        shard_keep = shard_mask(ids, shard[0], shard[1])
        n_skipped = int(len(ids) - shard_keep.sum())
    _an = _process_analyzer(analyzer_config)
    analyze = _an.analyze
    analyze_pos = _an.analyze_with_positions
    analyze_tfs = getattr(_an, "analyze_with_tfs", None)  # SLR-style
    keep = np.ones(len(texts), dtype=bool)
    kept_dls: list[int] = []
    flat_terms: list[str] = []
    flat_tfs: list[int] = []
    offsets: list[int] = [0]
    positions = store_positions
    flat_pos: list[int] = []
    pos_inner_off: list[int] = [0]
    from collections import Counter

    n_errors = 0
    for i, text in enumerate(texts):
        if shard_keep is not None and not shard_keep[i]:
            keep[i] = False
            continue
        if text is None or not text.strip():
            keep[i] = False
            continue
        try:
            if analyze_tfs is not None:
                a_terms, a_tfs = analyze_tfs(text)
                if not a_terms:
                    keep[i] = False
                    continue
                kept_dls.append(int(sum(a_tfs)))
                flat_terms.extend(a_terms)
                flat_tfs.extend(a_tfs)
                offsets.append(len(flat_terms))
                continue
            if positions:
                toks, tok_pos = analyze_pos(text)
            else:
                toks = analyze(text)
        except Exception:
            keep[i] = False
            n_errors += 1
            continue
        if positions:
            kept_dls.append(len(toks))
            posmap: dict[str, list[int]] = {}
            for t, p in zip(toks, tok_pos):
                posmap.setdefault(t, []).append(p)
            for t, plist in posmap.items():
                flat_terms.append(t)
                flat_tfs.append(len(plist))
                flat_pos.extend(plist)
                pos_inner_off.append(len(flat_pos))
        else:
            kept_dls.append(len(toks))
            counts = Counter(toks)  # C fast path
            flat_terms.extend(counts.keys())
            flat_tfs.extend(counts.values())
        offsets.append(len(flat_terms))
    idx = np.flatnonzero(keep)
    off = pa.array(np.asarray(offsets, dtype=np.int32))
    terms_col = pa.ListArray.from_arrays(off, pa.array(flat_terms, type=pa.string()))
    tfs_col = pa.ListArray.from_arrays(
        off, pa.array(np.asarray(flat_tfs, dtype=np.int32))
    )
    cols = [
        batch["conv_id"].take(pa.array(idx)),
        pc.cast(batch["turn_idx"].take(pa.array(idx)), pa.int32()),
        pa.array(np.asarray(kept_dls, dtype=np.int32)),
        terms_col,
        tfs_col,
    ]
    names = ["conv_id", "turn_idx", "dl", "terms", "tfs"]
    if "ts" in batch.column_names:
        cols.append(batch["ts"].take(pa.array(idx)))
        names.append("ts")
    if positions:
        inner = pa.ListArray.from_arrays(
            pa.array(np.asarray(pos_inner_off, dtype=np.int32)),
            pa.array(np.asarray(flat_pos, dtype=np.int32)),
        )
        cols.append(pa.ListArray.from_arrays(off, inner))
        names.append("positions")
    return pa.Table.from_arrays(cols, names=names), idx, n_errors, n_skipped


@ray.remote
class _ErrorCounter:
    def __init__(self):
        self.n = 0
        self.skipped = 0

    def add(self, k: int) -> None:
        self.n += k

    def add_skipped(self, k: int) -> None:
        self.skipped += k

    def value(self) -> int:
        return self.n

    def skipped_value(self) -> int:
        return self.skipped


@ray.remote
def _block_num_rows(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _block_rows_and_bounds(table: pa.Table):
    """(num_rows, internally_sorted, first_key, last_key) for one block —
    the per-block half of the assume_sorted verification."""
    n = table.num_rows
    if n == 0:
        return 0, True, None, None
    conv = table["conv_id"]
    turn = table["turn_idx"]
    c0, c1 = conv.slice(0, n - 1), conv.slice(1)
    t0, t1 = turn.slice(0, n - 1), turn.slice(1)
    ok = bool(
        pc.all(
            pc.or_(
                pc.less(c0, c1),
                pc.and_(pc.equal(c0, c1), pc.less(t0, t1)),
            )
        ).as_py()
        if n > 1
        else True
    )
    first = (conv[0].as_py(), turn[0].as_py())
    last = (conv[n - 1].as_py(), turn[n - 1].as_py())
    return n, ok, first, last


@ray.remote
def _attach_ordinals(table: pa.Table, offset: int) -> pa.Table:
    ords = pa.array(offset + np.arange(table.num_rows, dtype=np.int64))
    return table.append_column("doc_ord", ords)


class NotSortedError(ValueError):
    pass


def _is_not_sorted(e: BaseException) -> bool:
    """True if e is (or wraps, through Ray task-error layers) NotSortedError.
    Ray may bury the user exception under RayTaskError(UserCodeException), so
    the pickled traceback string is the fallback signal."""
    seen = 0
    root = e
    while e is not None and seen < 8:
        if isinstance(e, NotSortedError) or type(e).__name__ == "NotSortedError":
            return True
        e = getattr(e, "cause", None) or getattr(e, "__cause__", None)
        seen += 1
    return "NotSortedError" in str(root)


def _input_columns(paths: list[str]) -> list[str]:
    import pyarrow.parquet as pq

    names = set(
        pq.read_metadata(sorted(paths)[0]).schema.to_arrow_schema().names
    )
    return [c for c in ("conv_id", "turn_idx", "text", "ts") if c in names]


def _assign_ordinals(ds, verify_sorted: bool = False):
    """Deterministic global doc ordinals over a (sorted) materialized dataset.

    The driver holds one integer per block (the prefix sum), never row data —
    this is the scalable equivalent of a global row_number() without a second
    shuffle. Raw Ray tasks are used here because map_batches cannot see block
    position (a documented Dataset-API gap).

    With verify_sorted=True (the assume_sorted fast path), every block is
    checked for internal (conv_id, turn_idx) order and the driver checks the
    cross-block boundaries; NotSortedError triggers the caller's fallback to
    a real sort."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if verify_sorted:
        info = ray.get([_block_rows_and_bounds.remote(r) for r in refs])
        counts = [i[0] for i in info]
        prev_last = None
        for n, ok, first, last in info:
            if n == 0:
                continue
            if not ok:
                raise NotSortedError("block not internally sorted")
            if prev_last is not None and first <= prev_last:
                raise NotSortedError(
                    f"block boundary out of order: {first} after {prev_last}"
                )
            prev_last = last
    else:
        counts = ray.get([_block_num_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    new_refs = [
        _attach_ordinals.remote(r, int(off)) for r, off in zip(refs, offsets[:-1])
    ]
    return ray.data.from_arrow_refs(new_refs), int(offsets[-1])


def _encode_term_run(
    local_ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
):
    """Encode one (segment, term) run of postings (already ord-sorted) into a
    varint sub-block + per-block impact metadata.

    One varint_encode call per stream; block byte offsets derived from the
    per-value size array (vectorized), not from per-block encoding."""
    n = local_ords.size
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = local_ords[0]
    np.subtract(local_ords[1:], local_ords[:-1], out=gaps[1:])
    # NOTE: only the run's first value is absolute; later blocks start with a
    # relative gap — full-list decode is one cumsum, per-block decode shifts
    # by the stored absolute blk_first.
    nblocks = (n + block_size - 1) // block_size
    starts = np.arange(0, n, block_size)
    doc_sizes = varint_sizes(gaps)
    tf64 = tfs.astype(np.uint64)
    tf_sizes = varint_sizes(tf64)
    doc_blob = varint_encode(gaps)
    tf_blob = varint_encode(tf64)
    doc_cum = np.concatenate([[0], np.cumsum(doc_sizes)])
    tf_cum = np.concatenate([[0], np.cumsum(tf_sizes)])
    ends = np.minimum(starts + block_size, n)
    blk_first = local_ords[starts].astype(np.int32)
    blk_n = (ends - starts).astype(np.int32)
    blk_max_tf = np.maximum.reduceat(tfs, starts).astype(np.int32)
    blk_min_dl = np.minimum.reduceat(dls, starts).astype(np.int32)
    blk_doc_off = doc_cum[starts].astype(np.int32)
    blk_tf_off = tf_cum[starts].astype(np.int32)
    return (
        doc_blob,
        tf_blob,
        blk_first,
        blk_n,
        blk_max_tf,
        blk_min_dl,
        blk_doc_off,
        blk_tf_off,
    )


def make_subblock_encoder(seg_shift: int, block_size: int, skip_segments: frozenset):
    """Vectorized map_batches fn: explode tokenized docs to postings and
    encode per-(segment, term) varint sub-blocks within the batch. When the
    batch carries a `positions` column, each run also gets a pos_blob:
    per-posting delta-varint position streams (split at decode by tf)."""

    def encode_subblocks(batch: pa.Table) -> pa.Table:
        """Fully vectorized across ALL runs in the batch — no per-run Python.
        Realistic (Zipfian) vocabularies make the run count approach the
        posting count (~1 run per (term, doc) at the tail), so per-run numpy
        calls are ~100x slower than this batch-wide formulation: one varint
        stream per column for the WHOLE batch, runs sliced out zero-copy via
        Arrow LargeBinary offset buffers; per-run and per-block stats via
        np.reduceat."""
        n_docs = batch.num_rows
        if n_docs == 0:
            return _empty_subblock_table()
        doc_ords = batch["doc_ord"].to_numpy()
        dls = batch["dl"].to_numpy()
        terms_col = batch["terms"].combine_chunks()
        tfs_col = batch["tfs"].combine_chunks()
        lengths = pc.list_value_length(terms_col).to_numpy().astype(np.int64)
        flat_terms = pc.list_flatten(terms_col)
        flat_tfs = pc.list_flatten(tfs_col).to_numpy().astype(np.int32)
        has_pos = "positions" in batch.column_names
        if has_pos:
            pos_col = batch["positions"].combine_chunks()
            pos_flat = pc.list_flatten(pc.list_flatten(pos_col)).to_numpy()
            pcum = np.concatenate([[0], np.cumsum(flat_tfs.astype(np.int64))])
        post_ord = np.repeat(doc_ords, lengths)
        post_dl = np.repeat(dls, lengths).astype(np.int32)
        post_seg = (post_ord >> seg_shift).astype(np.int64)
        # group by (segment, term): dictionary-encode terms, lexsort
        dict_terms = pc.dictionary_encode(flat_terms)
        term_codes = dict_terms.indices.to_numpy().astype(np.int64)
        vocab = dict_terms.dictionary
        order = np.lexsort((post_ord, term_codes, post_seg))
        s_seg = post_seg[order]
        s_code = term_codes[order]
        s_ord = post_ord[order]
        s_tf = flat_tfs[order]
        s_dl = post_dl[order]
        if skip_segments:
            keep = ~np.isin(s_seg, np.asarray(sorted(skip_segments)))
            kept_idx = np.flatnonzero(keep)
            order = order[kept_idx]
            s_seg, s_code = s_seg[kept_idx], s_code[kept_idx]
            s_ord, s_tf, s_dl = s_ord[kept_idx], s_tf[kept_idx], s_dl[kept_idx]
        npost = s_seg.size
        if npost == 0:
            return _empty_subblock_table()
        # run boundaries where (segment, term) changes
        change = np.empty(npost, dtype=bool)
        change[0] = True
        np.logical_or(
            s_seg[1:] != s_seg[:-1], s_code[1:] != s_code[:-1], out=change[1:]
        )
        run_starts = np.flatnonzero(change)
        run_ends = np.append(run_starts[1:], npost)
        run_len = run_ends - run_starts
        n_runs = run_starts.size

        seg_mask = np.int64((1 << seg_shift) - 1)
        s_local = (s_ord & seg_mask).astype(np.uint64)
        # doc gaps across the WHOLE sorted stream, reset at run starts
        gaps = s_local.copy()
        gaps[1:] -= s_local[:-1]
        gaps[run_starts] = s_local[run_starts]
        doc_sizes = varint_sizes(gaps)
        doc_stream = varint_encode(gaps)
        doc_cum = np.concatenate([[0], np.cumsum(doc_sizes)])
        tf64 = s_tf.astype(np.uint64)
        tf_sizes = varint_sizes(tf64)
        tf_stream = varint_encode(tf64)
        tf_cum = np.concatenate([[0], np.cumsum(tf_sizes)])

        def _binary_runs(stream: bytes, cum: np.ndarray, bounds: np.ndarray):
            """LargeBinaryArray of per-run slices — one offsets buffer, the
            stream as the shared data buffer (no per-run bytes objects)."""
            offs = cum[np.append(bounds, npost)].astype(np.int64)
            return pa.Array.from_buffers(
                pa.large_binary(),
                len(bounds),
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(stream)],
            )

        # per-run stats (reduceat over the whole batch)
        run_cf = np.add.reduceat(s_tf.astype(np.int64), run_starts)
        run_max_tf = np.maximum.reduceat(s_tf, run_starts)

        # per-block flat stats: every run start is a block start, blocks are
        # block_size-aligned WITHIN each run
        run_id = np.repeat(np.arange(n_runs), run_len)
        pos_in_run = np.arange(npost, dtype=np.int64) - run_starts[run_id]
        blk_start_idx = np.flatnonzero(pos_in_run % block_size == 0)
        blk_end_idx = np.append(blk_start_idx[1:], npost)
        blk_run_id = run_id[blk_start_idx]
        blk_first = s_local[blk_start_idx].astype(np.int32)
        blk_n = (blk_end_idx - blk_start_idx).astype(np.int32)
        blk_max_tf = np.maximum.reduceat(s_tf, blk_start_idx).astype(np.int32)
        blk_min_dl = np.minimum.reduceat(s_dl, blk_start_idx).astype(np.int32)
        blk_doc_off = (doc_cum[blk_start_idx] - doc_cum[run_starts][blk_run_id]).astype(np.int32)
        blk_tf_off = (tf_cum[blk_start_idx] - tf_cum[run_starts][blk_run_id]).astype(np.int32)
        # list offsets: blocks per run
        blocks_per_run = np.bincount(blk_run_id, minlength=n_runs)
        blk_list_off = pa.array(
            np.concatenate([[0], np.cumsum(blocks_per_run)]).astype(np.int32)
        )

        def _blk_list(values: np.ndarray):
            return pa.ListArray.from_arrays(blk_list_off, pa.array(values))

        if has_pos:
            # gather per-posting position slices in sorted-posting order
            p_start = pcum[order]
            p_len = flat_tfs[order].astype(np.int64)
            total_pos = int(p_len.sum())
            out_off = np.concatenate([[0], np.cumsum(p_len)])
            gidx = np.repeat(p_start - out_off[:-1], p_len) + np.arange(total_pos)
            pos_sorted = pos_flat[gidx].astype(np.uint64)
            # delta within each posting, absolute at posting starts
            posting_starts = out_off[:-1][p_len > 0]
            pgaps = pos_sorted.copy()
            pgaps[1:] -= pos_sorted[:-1]
            pgaps[posting_starts] = pos_sorted[posting_starts]
            pos_sizes = varint_sizes(pgaps)
            pos_stream = varint_encode(pgaps)
            pos_cum_bytes = np.concatenate([[0], np.cumsum(pos_sizes)])
            # run boundaries in position space: positions of run_starts in
            # posting space -> byte offsets
            run_pos_bounds = out_off[run_starts]
            pos_offs = np.append(
                pos_cum_bytes[run_pos_bounds], pos_cum_bytes[-1]
            ).astype(np.int64)
            pos_blob_arr = pa.Array.from_buffers(
                pa.large_binary(),
                n_runs,
                [None, pa.py_buffer(pos_offs.tobytes()), pa.py_buffer(pos_stream)],
            )
        else:
            pos_blob_arr = pa.array([b""] * n_runs, type=pa.large_binary())

        term_strs = pc.take(vocab, pa.array(s_code[run_starts], type=pa.int64()))
        return pa.Table.from_arrays(
            [
                pa.array(s_seg[run_starts], type=pa.int64()),
                term_strs,
                pa.array(s_local[run_starts].astype(np.int64), type=pa.int64()),
                pa.array(run_len, type=pa.int64()),
                pa.array(run_cf, type=pa.int64()),
                pa.array(run_max_tf.astype(np.int32), type=pa.int32()),
                _binary_runs(doc_stream, doc_cum, run_starts),
                _binary_runs(tf_stream, tf_cum, run_starts),
                _blk_list(blk_first),
                _blk_list(blk_n),
                _blk_list(blk_max_tf),
                _blk_list(blk_min_dl),
                _blk_list(blk_doc_off),
                _blk_list(blk_tf_off),
                pos_blob_arr,
            ],
            names=_SUBBLOCK_NAMES,
        )

    return encode_subblocks


_SUBBLOCK_NAMES = [
    "segment_id", "term", "first_local", "df", "cf", "max_tf",
    "doc_blob", "tf_blob", "blk_first", "blk_n", "blk_max_tf",
    "blk_min_dl", "blk_doc_off", "blk_tf_off", "pos_blob",
]


def _empty_subblock_table() -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([], type=pa.int64()), pa.array([], type=pa.string()),
            pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
            pa.array([], type=pa.int64()), pa.array([], type=pa.int32()),
            pa.array([], type=pa.large_binary()), pa.array([], type=pa.large_binary()),
            pa.array([], type=pa.list_(pa.int32())), pa.array([], type=pa.list_(pa.int32())),
            pa.array([], type=pa.list_(pa.int32())), pa.array([], type=pa.list_(pa.int32())),
            pa.array([], type=pa.list_(pa.int32())), pa.array([], type=pa.list_(pa.int32())),
            pa.array([], type=pa.large_binary()),
        ],
        names=_SUBBLOCK_NAMES,
    )


@ray.remote
def _ts_local_combine(table: pa.Table, nparts: int) -> list[pa.Table]:
    """Per-block combine + hash partition: pyarrow C++ hash-aggregate the
    block's (term, df, cf), then split by a vectorized Arrow-buffer hash of
    term % nparts (no per-row Python). Returns one sub-table per partition."""
    from anserini_ray.stages.hashagg import vectorized_key_hash

    agg = (
        table.select(["term", "df", "cf"])
        .group_by(["term"])
        .aggregate([("df", "sum"), ("cf", "sum")])
        .rename_columns(["term", "gdf", "gcf"])
    )
    part = vectorized_key_hash(agg, ["term"], nparts)
    order = np.argsort(part, kind="stable")
    sorted_tbl = agg.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(nparts + 1))
    return [
        sorted_tbl.slice(bounds[p], bounds[p + 1] - bounds[p])
        for p in range(nparts)
    ]


@ray.remote
def _ts_merge_partition(*tables: pa.Table) -> pa.Table:
    parts = [t for t in tables if t.num_rows]
    if not parts:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "gdf": pa.array([], type=pa.int64()),
                "gcf": pa.array([], type=pa.int64()),
            }
        )
    return (
        pa.concat_tables(parts)
        .group_by(["term"])
        .aggregate([("gdf", "sum"), ("gcf", "sum")])
        .rename_columns(["term", "gdf", "gcf"])
    )


def _hash_agg_term_stats(skinny, shuffle_partitions: int | None):
    """Global (term -> df, cf) aggregate as an explicit Arrow-kernel hash
    shuffle: per-block pyarrow hash-aggregate (combiner) -> crc32-of-term
    partitioning -> per-partition merge tasks. Replaces Ray's sort-based
    string groupby, which costs ~10s per 600K skinny rows on a realistic
    (Zipfian) vocabulary — ~20x slower than this shape. Only pre-combined
    skinny stats move; partition count bounds reducer fan-in."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(shuffle_partitions or 32, cpus))
    refs = skinny.to_arrow_refs()
    per_block = [
        _ts_local_combine.options(num_returns=nparts).remote(r, nparts)
        for r in refs
    ]
    merged = [
        _ts_merge_partition.remote(*[blk[p] for blk in per_block])
        for p in range(nparts)
    ]
    return ray.data.from_arrow_refs(merged)


def write_termstats(skinny, index_dir: str, shuffle_partitions: int | None,
                    term_counts: dict[int, int] | None = None) -> dict[int, int]:
    """Global df/cf per term + per-segment termstats sidecars from the skinny
    (segment_id, term, df, cf) rows. The sidecar is first deduplicated to ONE
    row per (segment_id, term) via the Arrow-kernel hash aggregate — skinny
    arrives at unit granularity, so writing it raw repeats every term
    units-per-segment times (measured: a 135-unit 16M-doc segment wrote a
    139.8M-row / 1.7 GB sidecar whose load-time sort cost 275 s; distinct it
    is 1M rows). The global stats are attached back via a broadcast map-side
    join (`ray.put` once, read per task, vectorized `pc.index_in` hash
    lookup) below a vocab cap, or a distributed hash join above it. Returns
    per-segment posting-run row counts (manifest metadata), computed as
    narrow map partials."""
    from ..stages.hashagg import hash_aggregate

    per_seg = hash_aggregate(
        skinny,
        keys=["segment_id", "term"],
        aggs=[("sum", "df"), ("sum", "cf")],
        out_names=["df", "cf"],
        nparts=shuffle_partitions,
    ).materialize()  # consumed twice (global agg + sidecar write); sized
    # like the sidecar itself (distinct segment-terms), never raw rows
    # materialize: count() and to_arrow_refs()/join below would otherwise
    # EACH re-execute the whole aggregate (measured in the round-5 scaling
    # ladder as a fixed ~seconds driver cost that scales at ~0.6 and drags
    # the build ladder below the 0.8 bar at 32M turns)
    global_stats = _hash_agg_term_stats(per_seg, shuffle_partitions).materialize()
    vocab_size = global_stats.count()
    if vocab_size <= BROADCAST_VOCAB_LIMIT:
        blocks = [t for t in ray.get(global_stats.to_arrow_refs()) if t.num_rows]
        if blocks:
            gs = pa.concat_tables(blocks)
            stats_ref = ray.put(
                (
                    gs["term"].combine_chunks(),
                    gs["gdf"].combine_chunks(),
                    gs["gcf"].combine_chunks(),
                )
            )
        else:
            stats_ref = ray.put(
                (
                    pa.array([], type=pa.string()),
                    pa.array([], type=pa.int64()),
                    pa.array([], type=pa.int64()),
                )
            )

        def attach_stats(batch: pa.Table) -> pa.Table:
            terms_v, gdf_v, gcf_v = ray.get(stats_ref)
            idx = pc.index_in(batch["term"], value_set=terms_v)
            return pa.Table.from_arrays(
                [
                    batch["segment_id"],
                    batch["term"],
                    pc.take(gdf_v, idx),
                    pc.take(gcf_v, idx),
                ],
                names=["segment_id", "term", "gdf", "gcf"],
            )

        stats = per_seg.select_columns(["segment_id", "term"]).map_batches(
            attach_stats, batch_format="pyarrow"
        )
    else:
        # huge-vocab path: distributed hash join
        avail_cpus = int(ray.cluster_resources().get("CPU", 8))
        nparts = min(shuffle_partitions or 32, max(2, avail_cpus // 2))
        stats = per_seg.select_columns(["segment_id", "term"]).join(
            global_stats, "inner", nparts, on=("term",)
        )
    stats.write_parquet(
        os.path.join(index_dir, "termstats"), partition_cols=["segment_id"]
    )
    if term_counts is not None:
        # caller already knows per-segment run-row counts (streaming
        # markers) — skip the extra counting pass
        return term_counts
    # posting-run rows per segment (manifest metadata; narrow partial sums)
    term_counts = {}
    for r in (
        skinny.select_columns(["segment_id"])
        .map_batches(
            lambda b: pa.table(
                {
                    "segment_id": pa.array(
                        np.unique(b["segment_id"].to_numpy())
                    ),
                    "cnt": pa.array(
                        np.unique(
                            b["segment_id"].to_numpy(), return_counts=True
                        )[1],
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    ):
        sid = int(r["segment_id"])
        term_counts[sid] = term_counts.get(sid, 0) + int(r["cnt"])
    return term_counts


def _clean_for_build(index_dir: str, keep_segments: frozenset) -> None:
    """Remove index artifacts that the coming build will rewrite, keeping the
    partitions of resumable (finished, fingerprint-matching) segments.
    write_parquet appends files into existing partition dirs, so stale files
    must be gone before a rebuild."""
    import re
    import shutil

    for sub in ("postings", "docmap", "docvecs"):
        root = os.path.join(index_dir, sub)
        if not os.path.isdir(root):
            continue
        for entry in os.listdir(root):
            m = re.match(r"segment_id=(\d+)$", entry)
            path = os.path.join(root, entry)
            if m and int(m.group(1)) in keep_segments:
                continue
            shutil.rmtree(path, ignore_errors=True)
    # termstats hold GLOBAL stats → always rebuilt
    shutil.rmtree(os.path.join(index_dir, "termstats"), ignore_errors=True)
    man_dir = os.path.join(index_dir, "manifests")
    if os.path.isdir(man_dir):
        for entry in os.listdir(man_dir):
            m = re.match(r"seg-(\d+)\.json$", entry)
            if m and int(m.group(1)) in keep_segments:
                continue
            os.unlink(os.path.join(man_dir, entry))


def build_index(
    transcripts=None,
    index_dir: str = None,
    config: IndexConfig | None = None,
    input_files: list[str] | None = None,
    total_input: int | None = None,
    whitelist=None,
    dedup_docids: bool = False,
    input_paths: list[str] | None = None,
) -> IndexManifest:
    """Build the inverted index from a transcripts Dataset into index_dir.

    Returns the global IndexManifest. With config.resume=True, segments whose
    manifests match the input/config fingerprint are skipped (their postings
    and docmap partitions are kept).

    input_paths: when the input is sorted Parquet on disk (the common
    transcript-corpus case), pass the file list here instead of (or in
    addition to) a Dataset — the build takes the STREAMING path
    (`streaming.py`): ordinals from parquet metadata, one fused
    tokenize→encode→write pass, no corpus materialization, unit-granular
    resume. Falls back to the sort-based Dataset path automatically if the
    input turns out not to be (conv_id, turn_idx)-sorted.

    whitelist: optional iterable of docids ("conv:turn") — only these are
    indexed (broadcast-set semi-join; reference `-whitelist`,
    IndexCollection.java:208-211, 707-712).
    dedup_docids: last-write-wins upsert per (conv_id, turn_idx) by ts
    (reference `-uniqueDocid` updateDocument, IndexCollection.java:213-217);
    requires the ts column and forces the sort path."""
    import time as _time

    config = config or IndexConfig()

    if (
        input_paths is not None
        and config.assume_sorted
        and whitelist is None
        and not dedup_docids
    ):
        from .streaming import build_index_streaming

        try:
            return build_index_streaming(
                input_paths, index_dir, config, total_input=total_input
            )
        except Exception as e:  # NotSortedError possibly wrapped by Ray
            if not _is_not_sorted(e):
                raise
            import shutil

            for sub in ("postings", "docmap", "docvecs", "termstats",
                        "manifests", "units"):
                shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
            if transcripts is None:
                transcripts = ray.data.read_parquet(
                    sorted(input_paths), columns=_input_columns(input_paths)
                )
            config.assume_sorted = False
            input_files = input_files or list(input_paths)

    if transcripts is None:
        if input_paths is None:
            raise ValueError("build_index needs a Dataset or input_paths")
        transcripts = ray.data.read_parquet(
            sorted(input_paths), columns=_input_columns(input_paths)
        )
        input_files = input_files or list(input_paths)
    os.makedirs(index_dir, exist_ok=True)
    fingerprint = input_fingerprint(
        input_files or [], config.repr_for_fingerprint()
    )
    skip = (
        frozenset(completed_segments(index_dir, fingerprint))
        if config.resume
        else frozenset()
    )
    _clean_for_build(index_dir, skip)

    stage_secs: dict[str, float] = {}
    _t = _time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t
        now = _time.perf_counter()
        stage_secs[stage] = round(now - _t, 3)
        _t = now

    if whitelist is not None:
        wl_ref = ray.put(frozenset(whitelist))

        def wl_filter(batch: pa.Table) -> pa.Table:
            wl = ray.get(wl_ref)
            mask = pa.array(
                [
                    f"{c}:{t}" in wl
                    for c, t in zip(
                        batch["conv_id"].to_pylist(),
                        batch["turn_idx"].to_pylist(),
                    )
                ]
            )
            return batch.filter(mask)

        transcripts = transcripts.map_batches(wl_filter, batch_format="pyarrow")

    if dedup_docids:
        if "ts" not in transcripts.schema().names:
            raise ValueError("dedup_docids requires the ts column")
        from ..stages.dedup import unique_by_key

        transcripts = unique_by_key(
            transcripts, ["conv_id", "turn_idx"], "ts", keep="last"
        )
        # groupby output order is not conversation order
        config.assume_sorted = False

    if total_input is None:
        # One extra streaming pass just to count input rows (counter parity
        # with IndexCollection.java:880-890). Callers that know the input
        # cardinality (e.g. from parquet metadata) should pass total_input.
        total_input = transcripts.count()

    # Block order IS doc order for the assume_sorted path. A Dataset snapshots
    # its DataContext at creation, so we must flip preserve_order on the
    # CALLER-created dataset's captured context (mutating the global context
    # here would silently not apply — and out-of-order blocks would demote
    # every build to the sort fallback).
    ds_ctx = transcripts.context
    prev_preserve = ds_ctx.execution_options.preserve_order
    ds_ctx.execution_options.preserve_order = True
    try:
        err_name = f"anserini_err_{os.getpid()}_{abs(hash(index_dir)) % 10**8}"
        err_counter = _ErrorCounter.options(name=err_name).remote()
        tokenized = transcripts.map_batches(
            TokenizeDocs(config.analyzer, config.store_positions, err_name,
                         shard=config.shard),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        if config.assume_sorted:
            try:
                with_ords, indexed_count = _assign_ordinals(
                    tokenized, verify_sorted=True
                )
            except NotSortedError:
                # input wasn't ordered after all — fall back to the sort
                with_ords, indexed_count = _assign_ordinals(
                    tokenized.sort(["conv_id", "turn_idx"])
                )
        else:
            with_ords, indexed_count = _assign_ordinals(
                tokenized.sort(["conv_id", "turn_idx"])
            )
    finally:
        ds_ctx.execution_options.preserve_order = prev_preserve
    _mark("tokenize_sort_ordinals")

    # --- docmap (doc_ord → identity + doc length), partitioned by segment ---
    seg_shift = config.seg_shift

    def project_docmap(batch: pa.Table) -> pa.Table:
        ords = batch["doc_ord"].to_numpy()
        segs = pa.array((ords >> seg_shift).astype(np.int64))
        cols = [
            batch["doc_ord"],
            batch["conv_id"],
            batch["turn_idx"],
            batch["dl"],
            segs,
        ]
        names = ["doc_ord", "conv_id", "turn_idx", "dl", "segment_id"]
        if "ts" in batch.column_names:
            cols.append(batch["ts"])
            names.append("ts")
        return pa.Table.from_arrays(cols, names=names)

    # with_ords is backed by already-computed object refs, so consuming the
    # docmap projection twice (write + stats) just re-runs a trivial map —
    # no full materialization needed
    docmap = with_ords.map_batches(project_docmap, batch_format="pyarrow")
    new_docmap = docmap
    if skip:

        def drop_done_docs(batch: pa.Table) -> pa.Table:
            mask = ~np.isin(batch["segment_id"].to_numpy(), list(skip))
            return batch.filter(pa.array(mask))

        new_docmap = docmap.map_batches(drop_done_docs, batch_format="pyarrow")
    new_docmap.write_parquet(
        os.path.join(index_dir, "docmap"), partition_cols=["segment_id"]
    )
    _mark("docmap_write")

    if config.store_docvecs:

        def project_docvecs(batch: pa.Table) -> pa.Table:
            ords = batch["doc_ord"].to_numpy()
            segs = pa.array((ords >> seg_shift).astype(np.int64))
            out = pa.Table.from_arrays(
                [batch["doc_ord"], batch["terms"], batch["tfs"], segs],
                names=["doc_ord", "terms", "tfs", "segment_id"],
            )
            if skip:
                mask = ~np.isin(out["segment_id"].to_numpy(), list(skip))
                out = out.filter(pa.array(mask))
            return out

        with_ords.map_batches(
            project_docvecs, batch_format="pyarrow"
        ).write_parquet(
            os.path.join(index_dir, "docvecs"), partition_cols=["segment_id"]
        )
        _mark("docvecs_write")

    # --- postings: explode + encode sub-block runs; sub-block rows ARE the
    # on-disk format. Each row stores its absolute first ordinal, so the
    # reader concatenates a term's rows without any re-encoding — no
    # per-(term) merge stage exists at all (a per-group Python merge was
    # measured at ~8ms/group and scales with vocab x segments; a sort of the
    # compressed rows is vectorized and scales with bytes).
    encoder = make_subblock_encoder(seg_shift, config.block_size, skip)
    # batch_size bundles consecutive blocks into one encode task: longer
    # per-term runs => fewer sub-block rows
    subblocks = with_ords.map_batches(
        encoder,
        batch_format="pyarrow",
        batch_size=config.encode_batch_size,
    )
    # stream straight to partitioned parquet: no materialize (object-store
    # pressure at scale) and no locality sort (readers order a partition's
    # rows at load; the shuffle would move the whole compressed index)
    subblocks.write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["segment_id"]
    )
    _mark("encode_write")

    # --- term stats: ONE sort-based groupby(term) for global df/cf, then a
    # broadcast map-side join back onto the per-segment rows (ray.put once,
    # read per task). Dataset.join (hash-shuffle aggregator actors) only as
    # the fallback when the vocabulary exceeds the broadcast threshold.
    # stats come from a column-pruned read-back of what was just written —
    # only (term, df, cf) bytes leave disk, and on resume this naturally
    # covers kept segments too
    skinny = ray.data.read_parquet(
        os.path.join(index_dir, "postings"),
        columns=["term", "df", "cf", "segment_id"],
    ).materialize()
    term_counts = write_termstats(skinny, index_dir, config.shuffle_partitions)
    _mark("termstats")

    # --- per-segment doc stats: narrow map partials + driver combine (one
    # dict entry per segment on the driver — no shuffle) ---
    def seg_partials(batch: pa.Table):
        segs = batch["segment_id"].to_numpy()
        dls = batch["dl"].to_numpy()
        uniq = np.unique(segs)
        return pa.table(
            {
                "segment_id": pa.array(uniq),
                "cnt": pa.array(
                    [int((segs == s).sum()) for s in uniq], type=pa.int64()
                ),
                "sdl": pa.array(
                    [int(dls[segs == s].sum()) for s in uniq], type=pa.int64()
                ),
            }
        )

    seg_counts: dict[int, int] = {}
    seg_sum_dl: dict[int, int] = {}
    for r in docmap.map_batches(seg_partials, batch_format="pyarrow").take_all():
        sid = int(r["segment_id"])
        seg_counts[sid] = seg_counts.get(sid, 0) + int(r["cnt"])
        seg_sum_dl[sid] = seg_sum_dl.get(sid, 0) + int(r["sdl"])
    seg_rows = [
        {"segment_id": sid, "count()": seg_counts[sid], "sum(dl)": seg_sum_dl[sid]}
        for sid in sorted(seg_counts)
    ]
    _mark("collection_stats")

    if skip:
        # preserve num_terms recorded by the original build of kept segments
        import glob as _glob
        import json as _json

        for p in _glob.glob(os.path.join(index_dir, "manifests", "seg-*.json")):
            with open(p) as f:
                m = _json.load(f)
            if int(m["segment_id"]) in skip:
                term_counts.setdefault(int(m["segment_id"]), int(m["num_terms"]))

    doc_count = 0
    sum_dl = 0
    segments = []
    for r in sorted(seg_rows, key=lambda r: int(r["segment_id"])):
        sid = int(r["segment_id"])
        cnt = int(r["count()"])
        sdl = int(r["sum(dl)"])
        doc_count += cnt
        sum_dl += sdl
        sm = SegmentManifest(
            segment_id=sid,
            base_ord=sid << seg_shift,
            doc_count=cnt,
            sum_dl=sdl,
            num_terms=term_counts.get(sid, 0),
            fingerprint=fingerprint,
        )
        sm.write(index_dir)
        segments.append(
            {"segment_id": sid, "doc_count": cnt, "sum_dl": sdl,
             "num_terms": term_counts.get(sid, 0)}
        )

    n_errors_total = int(ray.get(err_counter.value.remote()))
    n_skipped_total = int(ray.get(err_counter.skipped_value.remote()))
    ray.kill(err_counter)
    manifest = IndexManifest(
        version=INDEX_FORMAT_VERSION,
        analyzer=make_analyzer(config.analyzer).config_fingerprint(),
        norm_mode=config.norm_mode,
        seg_shift=seg_shift,
        block_size=config.block_size,
        fingerprint=fingerprint,
        doc_count=doc_count,
        sum_total_tf=sum_dl,
        counters={
            "total_input": int(total_input),
            "indexed": doc_count,
            "empty": int(total_input) - indexed_count - n_errors_total
                     - n_skipped_total,
            "skipped": n_skipped_total,
            "errors": n_errors_total,
            "stage_secs": stage_secs,
        },
        segments=segments,
    )
    manifest.write(index_dir)
    return manifest

"""Distributed inverted-index build — the Ray-Data-native replacement for the
reference's Lucene `IndexWriter` path (`J/index/IndexCollection.java:729-893`).

Streaming DAG:

  read_parquet(transcripts)                                  [pruned columns]
    → map_batches(TokenizeDocs)         per-doc (conv_id, turn_idx, dl,
                                         terms, tfs); whitespace-empty docs
                                         dropped + counted (reference analog:
                                         EmptyDocumentException,
                                         DefaultLuceneDocumentGenerator.java:64-66)
    → sort(conv_id, turn_idx)           deterministic doc-ordinal order
                                        (tie-break parity: ScoredDocuments are
                                         later sorted by docid string,
                                         SearchCollection.java:115-116)
    → ordinal assignment                per-block prefix-sum offsets (driver
                                        holds ONE int per block, never rows)
    → map_batches(encode_subblocks)     explode to postings and IMMEDIATELY
                                        delta-gap + varint encode per
                                        (segment, term) *within the batch*.
                                        Sorted blocks are disjoint contiguous
                                        ordinal ranges, so sub-blocks never
                                        overlap — this is the explicit
                                        hot-term skew handling: a term with
                                        huge df is split into bounded
                                        sub-blocks by doc range, and the wide
                                        shuffle below moves compressed bytes,
                                        not raw postings.
    → groupby(segment_id, term).map_groups(merge)   stitch sub-blocks (byte
                                        concat + one varint rewrite each);
                                        per-block (≤128 docs) max-tf / min-dl
                                        impact metadata for block-max pruning
    → write_parquet(partition_cols=[segment_id])    posting segments
  + docmap  (doc_ord, conv_id, turn_idx, dl)        partitioned by segment
  + termstats (term, global df, global cf)          per segment, via one
                                        skinny groupby(term) over read-back
                                        posting metadata
  + manifests                           per-segment lineage + global stats;
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
from .varint import varint_encode

INDEX_FORMAT_VERSION = 1
BLOCK_SIZE = 128  # docs per impact block (block-max metadata granularity)


@dataclass
class IndexConfig:
    seg_shift: int = 17          # docs per segment = 1 << seg_shift
    block_size: int = BLOCK_SIZE
    analyzer: dict = field(default_factory=dict)
    norm_mode: str = "lucene"    # "lucene" (byte4-quantized dl) | "accurate"
    resume: bool = False

    def repr_for_fingerprint(self) -> str:
        return (
            f"v{INDEX_FORMAT_VERSION}|seg{self.seg_shift}|blk{self.block_size}"
            f"|{sorted(self.analyzer.items())}|{self.norm_mode}"
        )


class TokenizeDocs:
    """Stateful map_batches stage: analyzer built once per actor
    (reference analog: per-thread generator, IndexCollection.java:164-165)."""

    def __init__(self, analyzer_config: dict | None = None):
        self.analyzer = make_analyzer(analyzer_config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        analyze = self.analyzer.analyze
        keep = np.ones(len(texts), dtype=bool)
        dls = np.zeros(len(texts), dtype=np.int32)
        all_terms: list[list[str]] = []
        all_tfs: list[list[int]] = []
        for i, text in enumerate(texts):
            if text is None or not text.strip():
                keep[i] = False
                all_terms.append([])
                all_tfs.append([])
                continue
            toks = analyze(text)
            dls[i] = len(toks)
            if toks:
                counts: dict[str, int] = {}
                for t in toks:
                    counts[t] = counts.get(t, 0) + 1
                all_terms.append(list(counts.keys()))
                all_tfs.append(list(counts.values()))
            else:
                all_terms.append([])
                all_tfs.append([])
        idx = np.flatnonzero(keep)
        return pa.Table.from_arrays(
            [
                batch["conv_id"].take(pa.array(idx)),
                pc.cast(batch["turn_idx"].take(pa.array(idx)), pa.int32()),
                pa.array(dls[idx], type=pa.int32()),
                pa.array([all_terms[i] for i in idx], type=pa.list_(pa.string())),
                pa.array([all_tfs[i] for i in idx], type=pa.list_(pa.int32())),
            ],
            names=["conv_id", "turn_idx", "dl", "terms", "tfs"],
        )


@ray.remote
def _block_num_rows(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _attach_ordinals(table: pa.Table, offset: int) -> pa.Table:
    ords = pa.array(offset + np.arange(table.num_rows, dtype=np.int64))
    return table.append_column("doc_ord", ords)


def _assign_ordinals(sorted_ds):
    """Deterministic global doc ordinals over a sorted, materialized dataset.

    The driver holds one integer per block (the prefix sum), never row data —
    this is the scalable equivalent of a global row_number() without a second
    shuffle. Raw Ray tasks are used here because map_batches cannot see block
    position (a documented Dataset-API gap)."""
    mat = sorted_ds.materialize()
    refs = mat.to_arrow_refs()
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
    varint sub-block + per-block impact metadata."""
    n = local_ords.size
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = local_ords[0]
    np.subtract(local_ords[1:], local_ords[:-1], out=gaps[1:])
    nblocks = (n + block_size - 1) // block_size
    blk_first = np.empty(nblocks, dtype=np.int32)
    blk_n = np.empty(nblocks, dtype=np.int32)
    blk_max_tf = np.empty(nblocks, dtype=np.int32)
    blk_min_dl = np.empty(nblocks, dtype=np.int32)
    blk_doc_off = np.empty(nblocks, dtype=np.int32)
    blk_tf_off = np.empty(nblocks, dtype=np.int32)
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    doc_pos = 0
    tf_pos = 0
    for b in range(nblocks):
        lo, hi = b * block_size, min(n, (b + 1) * block_size)
        dblob = varint_encode(gaps[lo:hi])
        tblob = varint_encode(tfs[lo:hi])
        blk_first[b] = local_ords[lo]
        blk_n[b] = hi - lo
        blk_max_tf[b] = tfs[lo:hi].max()
        blk_min_dl[b] = dls[lo:hi].min()
        blk_doc_off[b] = doc_pos
        blk_tf_off[b] = tf_pos
        doc_parts.append(dblob)
        tf_parts.append(tblob)
        doc_pos += len(dblob)
        tf_pos += len(tblob)
    return (
        b"".join(doc_parts),
        b"".join(tf_parts),
        blk_first,
        blk_n,
        blk_max_tf,
        blk_min_dl,
        blk_doc_off,
        blk_tf_off,
    )


def make_subblock_encoder(seg_shift: int, block_size: int, skip_segments: frozenset):
    """Vectorized map_batches fn: explode tokenized docs to postings and
    encode per-(segment, term) varint sub-blocks within the batch."""

    def encode_subblocks(batch: pa.Table) -> pa.Table:
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
        # run boundaries where (segment, term) changes
        change = np.empty(s_seg.size, dtype=bool)
        change[0] = True
        np.logical_or(
            s_seg[1:] != s_seg[:-1], s_code[1:] != s_code[:-1], out=change[1:]
        )
        run_starts = np.flatnonzero(change)
        run_ends = np.append(run_starts[1:], s_seg.size)

        out = {
            "segment_id": [], "term_code": [], "first_local": [], "df": [],
            "cf": [], "max_tf": [], "doc_blob": [], "tf_blob": [],
            "blk_first": [], "blk_n": [], "blk_max_tf": [], "blk_min_dl": [],
            "blk_doc_off": [], "blk_tf_off": [],
        }
        seg_mask = (1 << seg_shift) - 1
        for lo, hi in zip(run_starts, run_ends):
            seg = int(s_seg[lo])
            if seg in skip_segments:
                continue
            local = (s_ord[lo:hi] & seg_mask).astype(np.uint64)
            tf_run = s_tf[lo:hi]
            dl_run = s_dl[lo:hi]
            (dblob, tblob, bf, bn, bmt, bmd, bdo, bto) = _encode_term_run(
                local, tf_run.astype(np.uint64), dl_run, block_size
            )
            out["segment_id"].append(seg)
            out["term_code"].append(int(s_code[lo]))
            out["first_local"].append(int(local[0]))
            out["df"].append(hi - lo)
            out["cf"].append(int(tf_run.sum()))
            out["max_tf"].append(int(tf_run.max()))
            out["doc_blob"].append(dblob)
            out["tf_blob"].append(tblob)
            out["blk_first"].append(bf)
            out["blk_n"].append(bn)
            out["blk_max_tf"].append(bmt)
            out["blk_min_dl"].append(bmd)
            out["blk_doc_off"].append(bdo)
            out["blk_tf_off"].append(bto)
        if not out["segment_id"]:
            return _empty_subblock_table()
        term_strs = pc.take(vocab, pa.array(out["term_code"], type=pa.int64()))
        return pa.Table.from_arrays(
            [
                pa.array(out["segment_id"], type=pa.int64()),
                term_strs,
                pa.array(out["first_local"], type=pa.int64()),
                pa.array(out["df"], type=pa.int64()),
                pa.array(out["cf"], type=pa.int64()),
                pa.array(out["max_tf"], type=pa.int32()),
                pa.array(out["doc_blob"], type=pa.large_binary()),
                pa.array(out["tf_blob"], type=pa.large_binary()),
                pa.array(out["blk_first"], type=pa.list_(pa.int32())),
                pa.array(out["blk_n"], type=pa.list_(pa.int32())),
                pa.array(out["blk_max_tf"], type=pa.list_(pa.int32())),
                pa.array(out["blk_min_dl"], type=pa.list_(pa.int32())),
                pa.array(out["blk_doc_off"], type=pa.list_(pa.int32())),
                pa.array(out["blk_tf_off"], type=pa.list_(pa.int32())),
            ],
            names=_SUBBLOCK_NAMES,
        )

    return encode_subblocks


_SUBBLOCK_NAMES = [
    "segment_id", "term", "first_local", "df", "cf", "max_tf",
    "doc_blob", "tf_blob", "blk_first", "blk_n", "blk_max_tf",
    "blk_min_dl", "blk_doc_off", "blk_tf_off",
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
        ],
        names=_SUBBLOCK_NAMES,
    )


def _varint_first_len(blob: bytes) -> int:
    i = 0
    while blob[i] & 0x80:
        i += 1
    return i + 1


def merge_subblocks(group: pa.Table) -> pa.Table:
    """Stitch the ord-disjoint sub-blocks of one (segment, term) into the
    final posting list: byte concat, rewriting only the first doc-gap varint
    of each non-initial sub-block to the delta from the previous sub-block's
    last doc."""
    order = np.argsort(group["first_local"].to_numpy(), kind="stable")
    firsts = group["first_local"].to_numpy()[order]
    doc_blobs = [group["doc_blob"][int(i)].as_py() for i in order]
    tf_blobs = [group["tf_blob"][int(i)].as_py() for i in order]
    blk_first = [group["blk_first"][int(i)].values.to_numpy() for i in order]
    blk_n = [group["blk_n"][int(i)].values.to_numpy() for i in order]
    blk_max_tf = [group["blk_max_tf"][int(i)].values.to_numpy() for i in order]
    blk_min_dl = [group["blk_min_dl"][int(i)].values.to_numpy() for i in order]
    blk_doc_off = [group["blk_doc_off"][int(i)].values.to_numpy() for i in order]
    blk_tf_off = [group["blk_tf_off"][int(i)].values.to_numpy() for i in order]
    dfs = group["df"].to_numpy()[order]

    doc_parts: list[bytes] = [doc_blobs[0]]
    doc_off_parts = [blk_doc_off[0]]
    doc_pos = len(doc_blobs[0])
    # last local ord of each sub-block = its last block's first + decoded tail…
    # cheaper: last = first_local of NEXT is unrelated; recover last from
    # blk_first/blk_n of the same sub-block: we stored gaps, so track via
    # stored metadata: last block's docs count — we need actual last ord.
    # We stored blk_first (absolute), so last ord of sub-block k is
    # blk_first[-1] + (gaps within last block) … not stored. Instead we carry
    # it exactly: re-derive from df and gap stream is wasteful, so sub-blocks
    # store absolute first and we recompute last from the final block decode.
    from .varint import varint_decode

    def subblock_last(k: int) -> int:
        # decode only the final block of sub-block k
        off = int(blk_doc_off[k][-1])
        gaps = varint_decode(doc_blobs[k][off:], int(blk_n[k][-1]))
        base = int(blk_first[k][-1])
        return base + int(gaps[1:].sum()) if gaps.size > 1 else base

    prev_last = subblock_last(0)
    for k in range(1, len(doc_blobs)):
        blob = doc_blobs[k]
        flen = _varint_first_len(blob)
        new_first = varint_encode(
            np.array([firsts[k] - prev_last], dtype=np.uint64)
        )
        delta = len(new_first) - flen
        doc_parts.append(new_first)
        doc_parts.append(blob[flen:])
        offs = blk_doc_off[k].astype(np.int64) + doc_pos + delta
        offs[0] = doc_pos  # first block starts at the rewritten varint
        doc_off_parts.append(offs)
        doc_pos += len(blob) + delta
        prev_last = subblock_last(k)

    tf_parts = []
    tf_off_parts = []
    tf_pos = 0
    for k in range(len(tf_blobs)):
        tf_parts.append(tf_blobs[k])
        tf_off_parts.append(blk_tf_off[k].astype(np.int64) + tf_pos)
        tf_pos += len(tf_blobs[k])

    return pa.Table.from_arrays(
        [
            pa.array([int(group["segment_id"][0].as_py())], type=pa.int64()),
            pa.array([group["term"][0].as_py()], type=pa.string()),
            pa.array([int(dfs.sum())], type=pa.int64()),
            pa.array([int(group["cf"].to_numpy().sum())], type=pa.int64()),
            pa.array([int(group["max_tf"].to_numpy().max())], type=pa.int32()),
            pa.array([b"".join(doc_parts)], type=pa.large_binary()),
            pa.array([b"".join(tf_parts)], type=pa.large_binary()),
            pa.array([np.concatenate(blk_first)], type=pa.list_(pa.int32())),
            pa.array([np.concatenate(blk_n)], type=pa.list_(pa.int32())),
            pa.array([np.concatenate(blk_max_tf)], type=pa.list_(pa.int32())),
            pa.array([np.concatenate(blk_min_dl)], type=pa.list_(pa.int32())),
            pa.array(
                [np.concatenate(doc_off_parts).astype(np.int64)],
                type=pa.list_(pa.int64()),
            ),
            pa.array(
                [np.concatenate(tf_off_parts).astype(np.int64)],
                type=pa.list_(pa.int64()),
            ),
        ],
        names=[
            "segment_id", "term", "df", "cf", "max_tf", "doc_blob", "tf_blob",
            "blk_first", "blk_n", "blk_max_tf", "blk_min_dl",
            "blk_doc_off", "blk_tf_off",
        ],
    )


def _attach_global_stats(group: pa.Table) -> pa.Table:
    """groupby(term).map_groups: compute global df/cf for one term and emit a
    (segment_id, term, gdf, gcf) row per segment the term appears in."""
    gdf = int(group["df"].to_numpy().sum())
    gcf = int(group["cf"].to_numpy().sum())
    n = group.num_rows
    return pa.Table.from_arrays(
        [
            group["segment_id"],
            group["term"],
            pa.array([gdf] * n, type=pa.int64()),
            pa.array([gcf] * n, type=pa.int64()),
        ],
        names=["segment_id", "term", "gdf", "gcf"],
    )


def _clean_for_build(index_dir: str, keep_segments: frozenset) -> None:
    """Remove index artifacts that the coming build will rewrite, keeping the
    partitions of resumable (finished, fingerprint-matching) segments.
    write_parquet appends files into existing partition dirs, so stale files
    must be gone before a rebuild."""
    import re
    import shutil

    for sub in ("postings", "docmap"):
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
    transcripts,
    index_dir: str,
    config: IndexConfig | None = None,
    input_files: list[str] | None = None,
) -> IndexManifest:
    """Build the inverted index from a transcripts Dataset into index_dir.

    Returns the global IndexManifest. With config.resume=True, segments whose
    manifests match the input/config fingerprint are skipped (their postings
    and docmap partitions are kept)."""
    config = config or IndexConfig()
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

    total_input = transcripts.count()

    tokenized = transcripts.map_batches(
        TokenizeDocs,
        fn_constructor_args=(config.analyzer,),
        batch_format="pyarrow",
        concurrency=(1, 64),
        zero_copy_batch=True,
    )
    sorted_docs = tokenized.sort(["conv_id", "turn_idx"])
    with_ords, indexed_count = _assign_ordinals(sorted_docs)

    # --- docmap (doc_ord → identity + doc length), partitioned by segment ---
    seg_shift = config.seg_shift

    def project_docmap(batch: pa.Table) -> pa.Table:
        ords = batch["doc_ord"].to_numpy()
        segs = pa.array((ords >> seg_shift).astype(np.int64))
        return pa.Table.from_arrays(
            [
                batch["doc_ord"],
                batch["conv_id"],
                batch["turn_idx"],
                batch["dl"],
                segs,
            ],
            names=["doc_ord", "conv_id", "turn_idx", "dl", "segment_id"],
        )

    docmap = with_ords.map_batches(
        project_docmap, batch_format="pyarrow"
    ).materialize()  # skinny (one row per doc); reused for write + stats
    new_docmap = docmap
    if skip:

        def drop_done_docs(batch: pa.Table) -> pa.Table:
            mask = ~np.isin(batch["segment_id"].to_numpy(), list(skip))
            return batch.filter(pa.array(mask))

        new_docmap = docmap.map_batches(drop_done_docs, batch_format="pyarrow")
    new_docmap.write_parquet(
        os.path.join(index_dir, "docmap"), partition_cols=["segment_id"]
    )

    # --- postings: explode+encode sub-blocks, stitch per (segment, term) ---
    encoder = make_subblock_encoder(seg_shift, config.block_size, skip)
    subblocks = with_ords.map_batches(encoder, batch_format="pyarrow")
    merged = subblocks.groupby(["segment_id", "term"]).map_groups(
        merge_subblocks, batch_format="pyarrow"
    ).materialize()  # the compressed index — far smaller than the corpus;
    # materializing lets us write it AND derive stats in one execution
    merged.write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["segment_id"]
    )

    # --- global term stats: one skinny groupby(term) shuffle ---
    stats = (
        merged.select_columns(["segment_id", "term", "df", "cf"])
        .groupby("term")
        .map_groups(_attach_global_stats, batch_format="pyarrow")
    )
    if skip:
        # resumed build: stats above only cover newly built segments; fold in
        # the kept segments' postings metadata (skinny read, column-pruned)
        kept = ray.data.read_parquet(
            os.path.join(index_dir, "postings"),
            columns=["term", "df", "cf", "segment_id"],
        )
        stats = (
            kept.groupby("term")
            .map_groups(_attach_global_stats, batch_format="pyarrow")
        )
    stats.write_parquet(
        os.path.join(index_dir, "termstats"), partition_cols=["segment_id"]
    )

    # --- collection stats + manifests (driver holds one row per segment) ---
    from ray.data.aggregate import Count, Sum

    per_seg = docmap.groupby("segment_id").aggregate(Count(), Sum("dl"))
    seg_rows = per_seg.take_all()
    term_counts = {
        int(r["segment_id"]): int(r["count()"])
        for r in merged.groupby("segment_id").aggregate(Count()).take_all()
    }

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
            "empty": int(total_input) - indexed_count,
            "skipped": 0,
            "errors": 0,
        },
        segments=segments,
    )
    manifest.write(index_dir)
    return manifest

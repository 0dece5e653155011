"""In-memory reader over one or more index segment partitions.

Reference analog: the per-thread `IndexSearcher` over an open
`IndexReader` (`J/search/SearchCollection.java:138-158, 221-225`); term →
postings lookup is `J/index/IndexReaderUtils.java:303-317`. One
SegmentReader is built ONCE per searcher actor (load in `__init__`, never per
batch).

On-disk posting format: each parquet row is one varint-encoded SUB-BLOCK RUN
of a (segment, term) posting list — a doc-ord-contiguous range produced by
one encode task. Runs store their absolute first local ordinal, so a term's
full posting list is the ordered concatenation of its runs with no
re-encoding; the reader presents a merged per-term view (df/cf/max_tf,
postings, per-block impact metadata for block-max pruning).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..index.varint import varint_decode
from ..state.manifest import IndexManifest
from .norms import quantize_lengths


class _SortedTermMap:
    """dict-like (.get / .items / in) view over a term-sorted Arrow column
    pair. Lookups binary-search the Arrow string array directly (~20 scalar
    reads), so the whole vocabulary never materializes as Python objects —
    the difference between ~50 MB of Arrow buffers and tens of GB of dict
    entries on a realistic million-term vocabulary."""

    __slots__ = ("_terms", "_vals", "_memo")

    def __init__(self, terms: pa.Array, values: np.ndarray):
        self._terms = terms
        self._vals = values
        self._memo: dict = {}

    def _lookup(self, term: str) -> int | None:
        t = self._terms
        lo, hi = 0, len(t)
        while lo < hi:
            mid = (lo + hi) // 2
            if t[mid].as_py() < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(t) and t[lo].as_py() == term:
            return int(self._vals[lo])
        return None

    def get(self, term: str, default=None):
        memo = self._memo
        if term in memo:
            v = memo[term]
        else:
            v = self._lookup(term)
            if len(memo) < 200_000:
                memo[term] = v
        return default if v is None else v

    def __contains__(self, term: str) -> bool:
        return self.get(term) is not None

    def __getitem__(self, term: str) -> int:
        v = self.get(term)
        if v is None:
            raise KeyError(term)
        return v

    def __len__(self) -> int:
        return len(self._terms)

    def items(self):
        vals = self._vals
        for i, t in enumerate(self._terms):
            yield t.as_py(), int(vals[i])


class _TermRangeMap:
    """term -> (row_lo, row_hi) posting-run ranges, binary-searched over
    the sorted unique-term Arrow column (same rationale as _SortedTermMap:
    no per-term Python objects at load)."""

    __slots__ = ("_terms", "_bounds", "_memo")

    def __init__(self, terms: pa.Array, bounds: np.ndarray):
        self._terms = terms
        self._bounds = bounds  # len(terms) + 1 row offsets
        self._memo: dict = {}

    def get(self, term: str, default=None):
        memo = self._memo
        if term in memo:
            v = memo[term]
        else:
            t = self._terms
            lo, hi = 0, len(t)
            while lo < hi:
                mid = (lo + hi) // 2
                if t[mid].as_py() < term:
                    lo = mid + 1
                else:
                    hi = mid
            v = None
            if lo < len(t) and t[lo].as_py() == term:
                v = (int(self._bounds[lo]), int(self._bounds[lo + 1]))
            if len(memo) < 200_000:
                memo[term] = v
        return default if v is None else v

    def __contains__(self, term: str) -> bool:
        return self.get(term) is not None

    def __len__(self) -> int:
        return len(self._terms)

    def items(self):
        b = self._bounds
        for i, t in enumerate(self._terms):
            yield t.as_py(), (int(b[i]), int(b[i + 1]))

    def values(self):
        b = self._bounds
        for i in range(len(self._terms)):
            yield (int(b[i]), int(b[i + 1]))


class SegmentReader:
    def __init__(self, index_dir: str, segment_id: int, manifest: IndexManifest):
        self.segment_id = segment_id
        self.manifest = manifest
        self.base_ord = segment_id << manifest.seg_shift
        self._index_dir = index_dir
        self._docvecs = None
        self._docid_to_local = None
        # decoded-postings LRU (hot high-df terms dominate decode cost;
        # bounded by total cached postings)
        self._decode_cache: dict[str, tuple] = {}
        self._decode_cache_postings = 0
        self._decode_cache_limit = 4_000_000  # ~32 MB of int64+int32

        post_path = os.path.join(index_dir, "postings", f"segment_id={segment_id}")
        if not os.path.isdir(os.path.join(index_dir, "postings")):
            # crash-window recovery: an interrupted optimize swap leaves
            # only postings.old (see optimize.recover_interrupted_optimize)
            from ..index.optimize import recover_interrupted_optimize

            recover_interrupted_optimize(index_dir)
        post = pq.read_table(post_path)
        # Order rows by (term, first_local) so a term's runs are adjacent —
        # but ONLY as a permutation (_perm: sorted position -> raw row id).
        # The previous post.take(order) materialized a re-sorted copy of the
        # WHOLE table including the varint blobs: on a run-fragmented 16M-doc
        # single segment (139.8M run rows, 4.7 GB of blobs) that cost 10+
        # minutes and tens of GB at every reader load. Blobs and per-row
        # arrays stay in parquet read order; every access maps through _perm.
        order = pc.sort_indices(
            post, sort_keys=[("term", "ascending"), ("first_local", "ascending")]
        )
        self._perm = order.to_numpy(zero_copy_only=False).astype(np.int64)
        self._rows = post
        self._df = post["df"].to_numpy()
        self._cf = post["cf"].to_numpy()
        self._row_max_tf = post["max_tf"].to_numpy()
        self._doc_blob = post["doc_blob"].combine_chunks()
        self._tf_blob = post["tf_blob"].combine_chunks()
        self._blk_first = post["blk_first"].combine_chunks()
        self._blk_n = post["blk_n"].combine_chunks()
        self._blk_max_tf = post["blk_max_tf"].combine_chunks()
        self._blk_min_dl = post["blk_min_dl"].combine_chunks()
        self._blk_doc_off = post["blk_doc_off"].combine_chunks()
        self._blk_tf_off = post["blk_tf_off"].combine_chunks()
        # term -> contiguous SORTED-position range [lo, hi): run boundaries
        # computed vectorized over a transient sorted gather of the term
        # column only (dropped after this block), looked up by binary search
        # — a Python dict over the posting dictionary costs tens of GB on a
        # realistic (million-term) vocabulary
        nrows = post.num_rows
        if nrows:
            terms_sorted = post["term"].combine_chunks().take(order)
            neq = pc.invert(
                pc.equal(
                    terms_sorted.slice(0, nrows - 1), terms_sorted.slice(1)
                )
            )
            change = neq.to_numpy(zero_copy_only=False)
            run_bounds = np.concatenate(
                [[0], np.flatnonzero(change) + 1, [nrows]]
            ).astype(np.int64)
            uniq_terms = terms_sorted.take(pa.array(run_bounds[:-1]))
            del terms_sorted
        else:
            run_bounds = np.zeros(1, dtype=np.int64)
            uniq_terms = pa.array([], type=pa.string())
        self._term_range = _TermRangeMap(uniq_terms, run_bounds)

        dm = pq.read_table(
            os.path.join(index_dir, "docmap", f"segment_id={segment_id}")
        )
        dorder = pc.sort_indices(dm["doc_ord"])
        dm = dm.take(dorder)
        self.doc_count = dm.num_rows
        # Raw local ordinals may have HOLES (streaming builds assign
        # doc_ord = input row position; dropped docs leave gaps). Postings
        # store raw ordinals on disk and SCORING RUNS IN RAW SPACE — per-doc
        # scoring arrays (score_dl_*, score_ts) are scattered once into raw-
        # indexed buffers of size local_span (= max raw ordinal + 1, bounded
        # by 1<<seg_shift), so the postings-decode hot path never remaps.
        # Only the final top-k candidates convert raw -> dense docmap rows
        # (doc_id_strings). On hole-free legacy indexes raw == dense and the
        # scatter is the identity (no extra memory).
        self._raw_local = (
            dm["doc_ord"].to_numpy() - self.base_ord
            if self.doc_count
            else np.empty(0, dtype=np.int64)
        ).astype(np.int64)
        self._holes = bool(
            self.doc_count
            and (
                self._raw_local[0] != 0
                or self._raw_local[-1] != self.doc_count - 1
            )
        )
        self.local_span = (
            int(self._raw_local[-1]) + 1 if self.doc_count else 0
        )
        if self._holes:
            lut = np.full(self.local_span, -1, dtype=np.int64)
            lut[self._raw_local] = np.arange(self.doc_count, dtype=np.int64)
            self._dense_lookup = lut
        else:
            self._dense_lookup = None
        self._conv_id = dm["conv_id"].combine_chunks()
        self._turn_idx = dm["turn_idx"].to_numpy()
        # optional per-doc timestamps (tweet time-filter analog)
        self.ts = (
            dm["ts"].cast(pa.int64()).to_numpy()
            if "ts" in dm.column_names
            else None
        )
        self.dl_raw = dm["dl"].to_numpy().astype(np.int64)
        # norm modes: stock Lucene quantizes dl through SmallFloat byte4
        self.dl_lucene = quantize_lengths(self.dl_raw).astype(np.float32)
        self.dl_accurate = self.dl_raw.astype(np.float32)

        def _scatter(dense_arr, dtype):
            if not self._holes:
                return dense_arr
            out = np.zeros(self.local_span, dtype=dtype)
            out[self._raw_local] = dense_arr
            return out

        # raw-space scoring views (identical objects when hole-free)
        self.score_dl_lucene = _scatter(self.dl_lucene, np.float32)
        self.score_dl_accurate = _scatter(self.dl_accurate, np.float32)
        self.score_ts = _scatter(self.ts, np.int64) if self.ts is not None else None

        ts = pq.read_table(
            os.path.join(index_dir, "termstats", f"segment_id={segment_id}"),
            columns=["term", "gdf", "gcf"],
        ).sort_by("term")
        # Sorted-Arrow binary-search maps, NOT Python dicts: on a realistic
        # vocabulary (1M terms x many segments) materializing dict entries
        # costs tens of GB and minutes of load; the Arrow table stays
        # compact and lookups are O(log V) with a hot-term memo.
        terms_sorted = ts["term"].combine_chunks()
        self.global_df = _SortedTermMap(terms_sorted, ts["gdf"].to_numpy())
        self.global_cf = _SortedTermMap(terms_sorted, ts["gcf"].to_numpy())

    # ------------------------------------------------------------------ api
    def clear_caches(self) -> None:
        """Drop the decoded-postings memo (for fair A/B benchmarking of
        query strategies that would otherwise share decode work)."""
        self._decode_cache.clear()
        self._decode_cache_postings = 0

    def has_term(self, term: str) -> bool:
        return term in self._term_range

    def df(self, term: str) -> int:
        r = self._term_range.get(term)
        return int(self._df[self._perm[r[0] : r[1]]].sum()) if r else 0

    def cf(self, term: str) -> int:
        r = self._term_range.get(term)
        return int(self._cf[self._perm[r[0] : r[1]]].sum()) if r else 0

    def max_tf(self, term: str) -> int:
        r = self._term_range.get(term)
        return int(self._row_max_tf[self._perm[r[0] : r[1]]].max()) if r else 0

    def iter_terms(self):
        """(term, df, cf) over this segment's dictionary (merged runs)."""
        for term, (lo, hi) in self._term_range.items():
            rows = self._perm[lo:hi]
            yield term, int(self._df[rows].sum()), int(self._cf[rows].sum())

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """Decode full posting list -> (local doc ords int64, tfs int32);
        memoized per reader up to a bounded number of cached postings."""
        hit = self._decode_cache.get(term)
        if hit is not None:
            return hit
        r = self._term_range.get(term)
        if r is None:
            return None
        lo, hi = r
        if hi - lo == 1:
            out = self._decode_row(int(self._perm[lo]))
        else:
            parts = [self._decode_row(int(i)) for i in self._perm[lo:hi]]
            out = (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
            )
        n = out[0].size
        if self._decode_cache_postings + n > self._decode_cache_limit:
            self._decode_cache.clear()
            self._decode_cache_postings = 0
        self._decode_cache[term] = out
        self._decode_cache_postings += n
        return out

    def dense_of_raw(self, raw_ords: np.ndarray) -> np.ndarray:
        """Raw local ordinals -> dense docmap row indices (identity when the
        segment is hole-free). Used only on final candidates, never in the
        decode hot path."""
        if self._dense_lookup is None:
            return raw_ords
        return self._dense_lookup[raw_ords]

    def all_local_ords(self) -> np.ndarray:
        """Every document's RAW local ordinal, in docmap (doc_ord) order."""
        return self._raw_local

    def _decode_row(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        # i is a RAW row id (already mapped through _perm by callers)
        df = int(self._df[i])
        gaps = varint_decode(self._doc_blob[i].as_py(), df)
        ords = np.cumsum(gaps, dtype=np.uint64).astype(np.int64)
        tfs = varint_decode(self._tf_blob[i].as_py(), df).astype(np.int32)
        return ords, tfs

    def block_meta(self, term: str):
        """Merged per-block impact metadata across the term's runs:
        (first, n, max_tf, min_dl, row_idx, local_block_idx) arrays, ordered
        by first ordinal."""
        r = self._term_range.get(term)
        if r is None:
            return None
        lo, hi = r
        firsts, ns, mts, mds, rows_, lblk = [], [], [], [], [], []
        for i in self._perm[lo:hi]:  # raw row ids, in (term, first_local) order
            i = int(i)
            bf = self._blk_first[i].values.to_numpy()
            firsts.append(bf)
            ns.append(self._blk_n[i].values.to_numpy())
            mts.append(self._blk_max_tf[i].values.to_numpy())
            mds.append(self._blk_min_dl[i].values.to_numpy())
            rows_.append(np.full(bf.size, i, dtype=np.int64))
            lblk.append(np.arange(bf.size, dtype=np.int64))
        return (
            np.concatenate(firsts),
            np.concatenate(ns),
            np.concatenate(mts),
            np.concatenate(mds),
            np.concatenate(rows_),
            np.concatenate(lblk),
        )

    def decode_blocks(
        self, term: str, chosen: np.ndarray, meta=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode only the selected merged-block indices of a posting list."""
        if meta is None:
            meta = self.block_meta(term)
        bf, bn, _, _, brow, blblk = meta
        ords_parts, tf_parts = [], []
        for b in chosen:
            i = int(brow[b])
            k = int(blblk[b])
            doc_blob = self._doc_blob[i].as_py()
            tf_blob = self._tf_blob[i].as_py()
            bdo = self._blk_doc_off[i].values.to_numpy()
            bto = self._blk_tf_off[i].values.to_numpy()
            d_lo = int(bdo[k])
            d_hi = int(bdo[k + 1]) if k + 1 < bdo.size else len(doc_blob)
            t_lo = int(bto[k])
            t_hi = int(bto[k + 1]) if k + 1 < bto.size else len(tf_blob)
            n = int(bn[b])
            gaps = varint_decode(doc_blob[d_lo:d_hi], n)
            vals = np.cumsum(gaps, dtype=np.uint64)
            vals = vals - gaps[0] + np.uint64(bf[b])
            ords_parts.append(vals.astype(np.int64))
            tf_parts.append(varint_decode(tf_blob[t_lo:t_hi], n).astype(np.int32))
        if not ords_parts:
            return np.empty(0, np.int64), np.empty(0, np.int32)
        return np.concatenate(ords_parts), np.concatenate(tf_parts)

    def positions(self, term: str):
        """Decode positional postings -> (local ords, tfs, flat positions,
        per-posting offsets into the flat array). Requires a
        store_positions=True build."""
        r = self._term_range.get(term)
        if r is None:
            return None
        lo, hi = r
        if "pos_blob" not in self._rows.column_names:
            raise ValueError(
                "index has no positions — rebuild with "
                "IndexConfig(store_positions=True)"
            )
        pos_col = self._rows["pos_blob"].combine_chunks()
        all_ords, all_tfs, all_pos = [], [], []
        for i in self._perm[lo:hi]:
            i = int(i)
            ords, tfs = self._decode_row(i)
            blob = pos_col[i].as_py()
            if not blob:
                raise ValueError(
                    "index has no positions — rebuild with "
                    "IndexConfig(store_positions=True)"
                )
            vals = varint_decode(blob, int(tfs.sum()))
            # segmented cumsum: absolute positions per posting
            bounds = np.cumsum(tfs.astype(np.int64))
            starts = np.concatenate([[0], bounds[:-1]])
            cs = np.cumsum(vals, dtype=np.uint64)
            base = np.repeat(cs[starts] - vals[starts], tfs)
            all_pos.append((cs - base).astype(np.int32))
            all_ords.append(ords)
            all_tfs.append(tfs)
        ords = np.concatenate(all_ords)
        tfs = np.concatenate(all_tfs)
        flat = np.concatenate(all_pos)
        offs = np.concatenate([[0], np.cumsum(tfs.astype(np.int64))])
        return ords, tfs, flat, offs

    def doc_id_strings(self, local_ords: np.ndarray) -> list[str]:
        """RAW local ordinals -> docid strings."""
        rows = self.dense_of_raw(np.asarray(local_ords, dtype=np.int64))
        convs = self._conv_id.take(pa.array(rows)).to_pylist()
        turns = self._turn_idx[rows]
        return [f"{c}:{t}" for c, t in zip(convs, turns)]

    # ---------------------------------------------------- forward index
    def docid_to_local(self, docid: str) -> int | None:
        """docid string -> RAW local ordinal (lazy reverse map)."""
        if self._docid_to_local is None:
            convs = self._conv_id.to_pylist()
            self._docid_to_local = {
                f"{c}:{t}": int(self._raw_local[i])
                for i, (c, t) in enumerate(zip(convs, self._turn_idx))
            }
        return self._docid_to_local.get(docid)

    def doc_vector(self, local_ord: int) -> dict[str, int]:
        """term -> tf forward vector (requires store_docvecs at build;
        reference analog reader.getTermVector, IndexReaderUtils.java:469-562).
        Terms come back in lexicographic order (Lucene TermsEnum order)."""
        if self._docvecs is None:
            dv_dir = os.path.join(
                self._index_dir, "docvecs", f"segment_id={self.segment_id}"
            )
            if not os.path.isdir(dv_dir):
                raise FileNotFoundError(
                    f"{dv_dir}: forward index not present — rebuild with "
                    "IndexConfig(store_docvecs=True) to use RM3/doc vectors"
                )
            dv = pq.read_table(dv_dir)
            order = pc.sort_indices(dv["doc_ord"])
            dv = dv.take(order)
            self._docvecs = (
                dv["doc_ord"].to_numpy(),
                dv["terms"].combine_chunks(),
                dv["tfs"].combine_chunks(),
            )
        ords, terms, tfs = self._docvecs
        # docvecs store GLOBAL RAW ordinals; local_ord is raw
        target = self.base_ord + int(local_ord)
        i = int(np.searchsorted(ords, target))
        if i >= ords.size or ords[i] != target:
            return {}
        t = terms[i].as_py()
        f = tfs[i].as_py()
        return dict(sorted(zip(t, f)))

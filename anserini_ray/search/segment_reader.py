"""In-memory reader over one or more index segment partitions.

Reference analog: the per-thread `IndexSearcher` over an open
`IndexReader` (`J/search/SearchCollection.java:138-158, 221-225`); term →
postings lookup is `J/index/IndexReaderUtils.java:303-317`. One
SegmentReader is built ONCE per searcher actor (load in `__init__`, never per
batch) and holds:

- term dict: term → row index into posting arrays (df, cf, blobs, per-block
  impact metadata for block-max pruning);
- doc map: local-ord-indexed conv_id / turn_idx / dl arrays;
- global term stats (df/cf across all segments) for idf;
- collection stats (N, avgdl) from the index manifest.
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


class SegmentReader:
    def __init__(self, index_dir: str, segment_id: int, manifest: IndexManifest):
        self.segment_id = segment_id
        self.manifest = manifest
        self.base_ord = segment_id << manifest.seg_shift

        post = pq.read_table(
            os.path.join(index_dir, "postings", f"segment_id={segment_id}")
        )
        self._terms = post["term"].combine_chunks()
        self._df = post["df"].to_numpy()
        self._cf = post["cf"].to_numpy()
        self._max_tf = post["max_tf"].to_numpy()
        self._doc_blob = post["doc_blob"].combine_chunks()
        self._tf_blob = post["tf_blob"].combine_chunks()
        self._blk_first = post["blk_first"].combine_chunks()
        self._blk_n = post["blk_n"].combine_chunks()
        self._blk_max_tf = post["blk_max_tf"].combine_chunks()
        self._blk_min_dl = post["blk_min_dl"].combine_chunks()
        self._blk_doc_off = post["blk_doc_off"].combine_chunks()
        self._blk_tf_off = post["blk_tf_off"].combine_chunks()
        self._term_idx = {
            t: i for i, t in enumerate(self._terms.to_pylist())
        }

        dm = pq.read_table(
            os.path.join(index_dir, "docmap", f"segment_id={segment_id}"),
            columns=["doc_ord", "conv_id", "turn_idx", "dl"],
        )
        order = pc.sort_indices(dm["doc_ord"])
        dm = dm.take(order)
        self.doc_count = dm.num_rows
        self._conv_id = dm["conv_id"].combine_chunks()
        self._turn_idx = dm["turn_idx"].to_numpy()
        self.dl_raw = dm["dl"].to_numpy().astype(np.int64)
        # norm modes: stock Lucene quantizes dl through SmallFloat byte4
        self.dl_lucene = quantize_lengths(self.dl_raw).astype(np.float32)
        self.dl_accurate = self.dl_raw.astype(np.float32)

        ts = pq.read_table(
            os.path.join(index_dir, "termstats", f"segment_id={segment_id}"),
            columns=["term", "gdf", "gcf"],
        )
        self.global_df = dict(
            zip(ts["term"].to_pylist(), ts["gdf"].to_numpy().tolist())
        )
        self.global_cf = dict(
            zip(ts["term"].to_pylist(), ts["gcf"].to_numpy().tolist())
        )

    # ------------------------------------------------------------------ api
    def has_term(self, term: str) -> bool:
        return term in self._term_idx

    def term_row(self, term: str) -> int | None:
        return self._term_idx.get(term)

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """Decode full posting list -> (local doc ords int64, tfs int32)."""
        i = self._term_idx.get(term)
        if i is None:
            return None
        df = int(self._df[i])
        doc_blob = self._doc_blob[i].as_py()
        tf_blob = self._tf_blob[i].as_py()
        gaps = varint_decode(doc_blob, df)
        ords = np.cumsum(gaps, dtype=np.uint64).astype(np.int64)
        tfs = varint_decode(tf_blob, df).astype(np.int32)
        return ords, tfs

    def block_meta(self, term: str):
        """Per-block impact metadata for block-max pruning:
        (first, n, max_tf, min_dl, doc_off, tf_off) arrays."""
        i = self._term_idx.get(term)
        if i is None:
            return None
        return (
            self._blk_first[i].values.to_numpy(),
            self._blk_n[i].values.to_numpy(),
            self._blk_max_tf[i].values.to_numpy(),
            self._blk_min_dl[i].values.to_numpy(),
            self._blk_doc_off[i].values.to_numpy(),
            self._blk_tf_off[i].values.to_numpy(),
        )

    def decode_blocks(self, term: str, block_ids: np.ndarray):
        """Decode only the selected impact blocks of a posting list."""
        i = self._term_idx[term]
        doc_blob = self._doc_blob[i].as_py()
        tf_blob = self._tf_blob[i].as_py()
        bf, bn, _, _, bdo, bto = self.block_meta(term)
        ords_parts, tf_parts = [], []
        nblocks = bf.size
        for b in block_ids:
            d_lo = int(bdo[b])
            d_hi = int(bdo[b + 1]) if b + 1 < nblocks else len(doc_blob)
            t_lo = int(bto[b])
            t_hi = int(bto[b + 1]) if b + 1 < nblocks else len(tf_blob)
            n = int(bn[b])
            gaps = varint_decode(doc_blob[d_lo:d_hi], n)
            vals = np.cumsum(gaps, dtype=np.uint64)
            vals = vals - gaps[0] + np.uint64(bf[b])
            ords_parts.append(vals.astype(np.int64))
            tf_parts.append(varint_decode(tf_blob[t_lo:t_hi], n).astype(np.int32))
        if not ords_parts:
            return np.empty(0, np.int64), np.empty(0, np.int32)
        return np.concatenate(ords_parts), np.concatenate(tf_parts)

    def doc_id_strings(self, local_ords: np.ndarray) -> list[str]:
        convs = self._conv_id.take(pa.array(local_ords)).to_pylist()
        turns = self._turn_idx[local_ords]
        return [f"{c}:{t}" for c, t in zip(convs, turns)]

"""Generic JSON/JSONL document collection source — reference analog:
`JsonCollection` (`J/collection/JsonCollection.java:103-147`): each record
needs `id` + `contents`; any corpus with those two fields can be indexed.

Documents are mapped onto the engine's transcript row shape with
conv_id = id, turn_idx = 0 (docid becomes "<id>:0"); role/tool/ts filled
with neutral values. This makes every engine pipeline (index build, BM25,
stats) reusable for arbitrary JSONL corpora, mirroring how the reference's
generators adapt any SourceDocument to the same Lucene schema."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .transcripts import TRANSCRIPT_SCHEMA


def _to_transcript_rows(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    ids = batch["id"]
    if not pa.types.is_string(ids.type):
        import pyarrow.compute as pc

        ids = pc.cast(ids, pa.string())
    return pa.Table.from_arrays(
        [
            ids,
            pa.array(np.zeros(n, dtype=np.int32)),
            pa.array(["doc"] * n),
            batch["contents"],
            pa.array([""] * n),
            pa.array(np.zeros(n, dtype=np.int64), type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def read_json_collection(path: str):
    """JSONL/JSON directory -> transcript-shaped Ray Dataset ready for
    build_index. Records must carry `id` and `contents`."""
    import ray.data

    ds = ray.data.read_json(path)
    return ds.map_batches(_to_transcript_rows, batch_format="pyarrow")

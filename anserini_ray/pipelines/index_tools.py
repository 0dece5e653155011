"""Index inspection / dump utilities — reference analogs:
`-dumpAllDocids` (sorted) and raw-doc dumps (`J/index/IndexUtils.java:89-129,
354-473`), `ExtractDocumentLengths` / `ExtractAverageDocumentLength`
(`J/util/ExtractDocumentLengths.java`, `ExtractAverageDocumentLength.java`),
`ExtractTopDfTerms` (`J/util/ExtractTopDfTerms.java`)."""

from __future__ import annotations

import pyarrow as pa


def dump_docids_sorted(index_dir: str) -> pa.Table:
    """All docids in sorted order (IndexUtils -dumpAllDocids analog)."""
    from ..search import LocalSearcher

    s = LocalSearcher(index_dir)
    ids: list[str] = []
    for r in s.readers:
        import numpy as np

        ids.extend(r.doc_id_strings(np.arange(r.doc_count)))
    ids.sort()
    return pa.table({"doc_id": ids})


def dump_doc_lengths(index_dir: str) -> pa.Table:
    """(doc_id, dl, dl_lossy) per doc — exact + byte4-quantized lengths
    (ExtractDocumentLengths prints both for stock-Lucene comparability)."""
    import numpy as np

    from ..search import LocalSearcher

    s = LocalSearcher(index_dir)
    out_id, out_dl, out_lossy = [], [], []
    for r in s.readers:
        ords = np.arange(r.doc_count)
        out_id.extend(r.doc_id_strings(ords))
        out_dl.extend(r.dl_raw.tolist())
        out_lossy.extend(r.dl_lucene.astype(int).tolist())
    return pa.table(
        {
            "doc_id": out_id,
            "dl": pa.array(out_dl, type=pa.int64()),
            "dl_lossy": pa.array(out_lossy, type=pa.int64()),
        }
    )


def top_df_terms(index_dir: str, k: int = 100) -> pa.Table:
    """Global top-k terms by df from the built index (ExtractTopDfTerms)."""
    from ..search import LocalSearcher

    s = LocalSearcher(index_dir)
    seen: dict[str, tuple[int, int]] = {}
    for r in s.readers:
        for term, gdf in r.global_df.items():
            if term not in seen:
                seen[term] = (gdf, r.global_cf.get(term, 0))
    items = sorted(seen.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return pa.table(
        {
            "term": [t for t, _ in items],
            "df": pa.array([v[0] for _, v in items], type=pa.int64()),
            "cf": pa.array([v[1] for _, v in items], type=pa.int64()),
        }
    )


def collection_stats_from_index(index_dir: str) -> pa.Table:
    """doc_count / sum_total_tf / avgdl straight from the manifest
    (ExtractAverageDocumentLength analog)."""
    from ..state import IndexManifest

    m = IndexManifest.read(index_dir)
    return pa.table(
        {
            "doc_count": pa.array([m.doc_count], type=pa.int64()),
            "sum_total_tf": pa.array([m.sum_total_tf], type=pa.int64()),
            "avgdl": pa.array([m.avgdl], type=pa.float64()),
        }
    )

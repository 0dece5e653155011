"""Learning-to-rank feature extraction over (query, doc) pairs — the
reference's `J/ltr/feature/**` family (chain loader FeatureExtractors.java,
CLI FeatureExtractorCli.java:44-120) re-expressed as an actor-pool
map_batches stage: the extractor loads the index once per actor and emits
one feature row per (qid, doc_id) pair.

Features (reference extractor in parens):
    doc_size              (DocSizeFeatureExtractor)      dl
    query_length          (QueryLength)                  #analyzed q tokens
    matching_term_count   (MatchingTermCount)
    unique_term_count     (UniqueTermCount)              distinct doc terms
    sum_matching_tf       (SumMatchingTf)
    bm25                  (BM25FeatureExtractor)         engine-parity score
    tfidf                 (TFIDFFeatureExtractor)        sum tf*ln(N/df)
    avg_idf               (AvgIDFFeatureExtractor)
    avg_ictf              (AvgICTFFeatureExtractor)      mean ln(|C|/cf)
    scq                   (SCQFeatureExtractor)          mean (1+ln cf)*ln(1+N/df)
    simplified_clarity    (SimplifiedClarityFeatureExtractor)
    ordered_pairs         (OrderedSequentialPairs)       adjacent q-bigrams in doc
    unordered_pairs       (UnorderedSequentialPairs, w=8)

Pair-count features need a store_positions index; they emit 0 otherwise.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

FEATURE_NAMES = [
    "doc_size", "query_length", "matching_term_count", "unique_term_count",
    "sum_matching_tf", "bm25", "tfidf", "avg_idf", "avg_ictf", "scq",
    "simplified_clarity", "ordered_pairs", "unordered_pairs", "pmi",
]


class LtrFeatureExtractor:
    """map_batches callable class over a (qid, query, doc_id) pair table."""

    def __init__(self, index_dir: str, unordered_window: int = 8):
        from ..search import LocalSearcher

        self.s = LocalSearcher(index_dir)
        self.window = unordered_window
        self.N = self.s.manifest.doc_count
        self.C = self.s.manifest.sum_total_tf
        self._has_positions = True

    def _doc_positions(self, docid: str) -> dict[str, list[int]] | None:
        for r in self.s.readers:
            lo = r.docid_to_local(docid)
            if lo is None:
                continue
            try:
                out: dict[str, list[int]] = {}
                for term in r.doc_vector(lo):
                    p = r.positions(term)
                    if p is None:
                        continue
                    ords, tfs, flat, offs = p
                    j = int(np.searchsorted(ords, lo))
                    if j < ords.size and ords[j] == lo:
                        out[term] = flat[offs[j] : offs[j + 1]].tolist()
                return out
            except ValueError:
                return None
        return None

    def _features(self, query: str, docid: str) -> list[float] | None:
        s = self.s
        if all(r.docid_to_local(docid) is None for r in s.readers):
            # reference: "Document Id %s expected but not found in index,
            # skipping" (BaseFeatureExtractor.java:235-238)
            return None
        qtoks = s.analyzer.analyze(query)
        dv = s.doc_vector(docid)
        dl = sum(dv.values())
        # first-occurrence order (NOT a set): float accumulation order must
        # be process-independent for deterministic features
        uniq = list(dict.fromkeys(qtoks))
        matching = [t for t in uniq if t in dv]
        sum_tf = float(sum(dv[t] for t in matching))

        def gdf(t):
            return max(s._global_df(t), 0)

        def gcf(t):
            for r in s.readers:
                v = r.global_cf.get(t)
                if v is not None:
                    return v
            return 0

        # bm25 via the engine itself (single-doc slice of a full search is
        # wasteful; compute scalar with the same float32 ops)
        from ..search.bm25 import F, idf
        from ..search.norms import byte4_to_int, int_to_byte4

        dlq = (
            byte4_to_int(int_to_byte4(dl))
            if s.mode == "lucene"
            else dl
        )
        bm25 = F(0)
        k1, b = s.params.k1, s.params.b
        for t in qtoks:
            tf = dv.get(t, 0)
            if tf == 0 or gdf(t) == 0:
                continue
            w = idf(gdf(t), self.N)
            norm = k1 * ((F(1) - b) + b * F(dlq) / s.params.avgdl)
            bm25 = bm25 + w * F(float(tf) / (float(tf) + float(norm)))

        tfidf = sum(
            dv[t] * math.log(self.N / gdf(t)) for t in matching if gdf(t) > 0
        )
        idfs = [
            math.log(self.N / gdf(t)) for t in uniq if gdf(t) > 0
        ]
        avg_idf = float(np.mean(idfs)) if idfs else 0.0
        ictfs = [
            math.log(self.C / gcf(t)) for t in uniq if gcf(t) > 0
        ]
        avg_ictf = float(np.mean(ictfs)) if ictfs else 0.0
        scqs = [
            (1 + math.log(gcf(t))) * math.log(1 + self.N / gdf(t))
            for t in uniq
            if gcf(t) > 0 and gdf(t) > 0
        ]
        scq = float(np.mean(scqs)) if scqs else 0.0
        # simplified clarity: sum P(t|q) * log2(P(t|q) / P(t|C))
        sc = 0.0
        for t in uniq:
            if gcf(t) <= 0:
                continue
            p_q = qtoks.count(t) / len(qtoks)
            p_c = gcf(t) / self.C
            sc += p_q * math.log(p_q / p_c, 2)

        # PMI over query-term pairs: log(df12 * N / (df1 * df2)) from
        # posting-list intersections (PMIFeatureExtractor analog), averaged
        pmi = 0.0
        uniq_list = sorted(uniq)
        npairs = 0
        for a_i in range(len(uniq_list)):
            for b_i in range(a_i + 1, len(uniq_list)):
                t1, t2 = uniq_list[a_i], uniq_list[b_i]
                df12 = 0
                for r in self.s.readers:
                    p1, p2 = r.postings(t1), r.postings(t2)
                    if p1 is None or p2 is None:
                        continue
                    df12 += int(
                        np.intersect1d(p1[0], p2[0], assume_unique=True).size
                    )
                npairs += 1
                if df12 > 0 and gdf(t1) > 0 and gdf(t2) > 0:
                    pmi += math.log(df12 * self.N / (gdf(t1) * gdf(t2)))
        pmi = pmi / npairs if npairs else 0.0

        ordered = unordered = 0.0
        if self._has_positions:
            posmap = self._doc_positions(docid)
            if posmap is None:
                self._has_positions = False
            else:
                for t1, t2 in zip(qtoks, qtoks[1:]):
                    p1 = posmap.get(t1, [])
                    p2 = set(posmap.get(t2, []))
                    if not p1 or not p2:
                        continue
                    ordered += sum(1 for p in p1 if p + 1 in p2)
                    unordered += sum(
                        1
                        for p in p1
                        for d in range(-self.window, self.window + 1)
                        if d != 0 and p + d in p2
                    )

        return [
            float(dl), float(len(qtoks)), float(len(matching)),
            float(len(dv)), sum_tf, float(bm25), float(tfidf), avg_idf,
            avg_ictf, scq, sc, ordered, unordered, pmi,
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = batch["query"].to_pylist()
        docids = batch["doc_id"].to_pylist()
        rows = [
            self._features(q, d) for q, d in zip(queries, docids)
        ]
        keep = [i for i, r in enumerate(rows) if r is not None]
        if len(keep) < len(rows):  # docs absent from the index are skipped
            batch = batch.take(pa.array(keep))
            rows = [rows[i] for i in keep]
        arr = np.asarray(rows, dtype=np.float64).reshape(len(rows), len(FEATURE_NAMES))
        cols = [batch["qid"], batch["doc_id"]]
        names = ["qid", "doc_id"]
        if "label" in batch.column_names:  # qrels grade passthrough
            cols.append(batch["label"])
            names.append("label")
        cols += [pa.array(arr[:, i]) for i in range(len(FEATURE_NAMES))]
        return pa.Table.from_arrays(cols, names=names + FEATURE_NAMES)


def extract_features(index_dir: str, pairs, concurrency=(1, 4)):
    """pairs: Ray Dataset (or pa.Table) with (qid, query, doc_id[, label]) →
    feature table via the actor-pool extractor (label passes through)."""
    import ray.data

    if isinstance(pairs, pa.Table):
        pairs = ray.data.from_arrow(pairs)
    return pairs.map_batches(
        LtrFeatureExtractor,
        fn_constructor_args=(index_dir,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def ltr_training_data(index_dir: str, topics: dict, qrels, concurrency=(1, 4)):
    """Labeled LTR training rows: qrels ⋈ topics → per-(qid, doc) feature
    extraction with the relevance grade as the label column.

    Mirrors the reference's printFeatures loop (`J/ltr/
    BaseFeatureExtractor.java:212-246`): iterate the qrels' (qid, docid,
    grade) triples, skip qids without a topic, extract the feature vector
    per judged doc, emit `grade` as the supervision label (negatives clamped
    to 0 per Qrels.getRelevanceGrade, Qrels.java:83).

    topics: {qid: query text}; qrels: pa.Table (qid, doc_id, grade) from
    sources.qrels (or a path string). Docs absent from the index are
    dropped by the extractor's doc lookup — matching the reference's
    "expected but not found, skipping" warning path."""
    import pyarrow.compute as pc

    if isinstance(qrels, str):
        from ..sources.qrels import read_qrels

        qrels = read_qrels(qrels)
    # broadcast-side topics lookup: one row per qrel with the query text
    qtexts = pa.array(
        [topics.get(q) for q in qrels["qid"].to_pylist()], type=pa.string()
    )
    grades = pc.max_element_wise(qrels["grade"], 0)  # clamp negatives
    pairs = pa.Table.from_arrays(
        [qrels["qid"], qtexts, qrels["doc_id"], pc.cast(grades, pa.int32())],
        names=["qid", "query", "doc_id", "label"],
    ).filter(pc.is_valid(qtexts))
    return extract_features(index_dir, pairs, concurrency=concurrency)


def to_ranklib_lines(features: pa.Table) -> list[str]:
    """RankLib/SVM-rank lines `grade qid:<q> 1:<f> ... # <docid>` —
    constructOutputString (`BaseFeatureExtractor.java:71-86`)."""
    out = []
    label = (
        features["label"].to_pylist()
        if "label" in features.column_names
        else [0] * features.num_rows
    )
    qids = features["qid"].to_pylist()
    docs = features["doc_id"].to_pylist()
    fcols = [features[n].to_pylist() for n in FEATURE_NAMES]
    for i in range(features.num_rows):
        feats = " ".join(
            f"{j + 1}:{fcols[j][i]}" for j in range(len(FEATURE_NAMES))
        )
        out.append(f"{label[i]} qid:{qids[i]} {feats} # {docs[i]}")
    return out

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
    "sum_matching_tf", "sum_term_frequency", "unigrams",
    "bm25", "tfidf", "avg_idf", "avg_ictf", "scq", "simplified_clarity",
    "ordered_pairs", "unordered_pairs",          # sequential bigrams, gap 8
    "ordered_pairs_6", "unordered_pairs_6",      # gap 6
    "ordered_pairs_10", "unordered_pairs_10",    # gap 10
    "ordered_all_pairs", "unordered_all_pairs",  # ALL query pairs, gap 8
    "sdm", "pmi",
    # tweet-family features (HashtagCount/LinkCount from indexed terms —
    # the TweetAnalyzer preserves #hashtags and URLs; IsTweetReply and the
    # follower/friend counts pass through from optional metadata columns on
    # the input pair table, 0 when absent)
    "hashtag_count", "link_count", "is_reply",
    "followers_count", "friends_count",
]

_PASSTHROUGH = {"is_reply", "followers_count", "friends_count"}


def _stream_from_posmap(posmap: dict[str, list[int]]) -> list[str]:
    """Token stream in position order — the TokenStreamFromTermVector
    reconstruction the reference extractors run on."""
    flat = [(p, t) for t, ps in posmap.items() for p in ps]
    flat.sort()
    return [t for _, t in flat]


def _count_pairs(stream, pair_map, back_map, gaps):
    """CountBigramPairs.countPairs (`J/ltr/feature/CountBigramPairs.java`),
    reduced to its equivalent quadratic form: for every stream position i
    whose token x keys pair_map, count stream[j] in pair_map[x] for
    j in (i, i+gap]; back_map matches credit the SECOND token's key."""
    counters = {g: {} for g in gaps}
    maxgap = max(gaps)
    n = len(stream)
    for i, x in enumerate(stream):
        fwd = pair_map.get(x)
        if fwd is not None:
            for j in range(i + 1, min(i + maxgap + 1, n)):
                if stream[j] in fwd:
                    d = j - i
                    for g in gaps:
                        if d <= g:
                            c = counters[g]
                            c[x] = c.get(x, 0) + 1
        if back_map:
            bwd = back_map.get(x)
            if bwd is not None:
                for j in range(i + 1, min(i + maxgap + 1, n)):
                    y = stream[j]
                    if y in bwd:
                        d = j - i
                        for g in gaps:
                            if d <= g:
                                c = counters[g]
                                c[y] = c.get(y, 0) + 1
    return counters


def _sdm_feature(stream, qtoks, lambda_t=0.5, lambda_o=0.2, lambda_u=0.3,
                 window=8):
    """SequentialDependenceModel LTR feature
    (`J/ltr/feature/SequentialDependenceModel.java`), quirks ported:
    the 'full independence' component sums log((count+1)/(|D|+1)) over ALL
    distinct doc tokens (the reference adds unseen tokens to the count map),
    and the unordered component falls back to the smoothing count when a
    pair never co-occurs."""
    import math

    n = len(stream)
    if n == 0 or len(qtoks) == 0:
        return 0.0
    # independence: count map seeded with query tokens, grown by all tokens
    term_count = {t: 0 for t in qtoks}
    for tok in stream:
        term_count[tok] = term_count.get(tok, 0) + 1
    denom = float(n + 1)
    independent = sum(
        math.log((c + 1) / denom) for c in term_count.values()
    )
    if len(qtoks) < 2:
        return lambda_t * independent
    pair_map = {}
    for i in range(len(qtoks) - 1):
        pair_map[qtoks[i]] = qtoks[i + 1]  # later pairs overwrite (HashMap)
    # ordered: state machine over the stream
    phrase = {t: 0 for t in pair_map}
    expected = ""
    to_increment = ""
    for tok in stream:
        if tok == expected:
            phrase[to_increment] += 1
        if tok in pair_map:
            expected = pair_map[tok]
            to_increment = tok
        else:
            expected = ""
            to_increment = ""
    ordered = sum(math.log((c + 1) / denom) for c in phrase.values())
    # unordered: sliding window of 2*window tokens, tested at index window-1
    phrase_u = {t: 0 for t in pair_map}
    single_u = {t: 1 for t in pair_map}
    win = stream[: 2 * window + 1]
    for i in range(min(window - 1, n)):
        x = win[i] if i < len(win) else None
        if x in pair_map and pair_map[x] in win:
            phrase_u[x] += 1
            single_u[x] += 1
    for k in range(2 * window + 1, n):
        win = win[1:] + [stream[k]]
        x = win[window - 1]
        if x in pair_map and pair_map[x] in win:
            phrase_u[x] += 1
            single_u[x] += 1
    unordered = 0.0
    for t, c in phrase_u.items():
        unordered += math.log((c if c else single_u[t]) / denom)
    return (
        lambda_t * independent + lambda_o * ordered + lambda_u * unordered
    )


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

        # window pair features + SDM over the reconstructed token stream
        # (all positional; emit 0 on a non-positional index)
        gaps = (6, 8, 10)
        seq_scores = {g: (0.0, 0.0) for g in gaps}
        allp_ordered = allp_unordered = 0.0
        sdm = 0.0
        if self._has_positions:
            posmap = self._doc_positions(docid)
            if posmap is None:
                self._has_positions = False
            else:
                stream = _stream_from_posmap(posmap)
                # sequential (adjacent) query bigrams
                seq_fwd: dict[str, set] = {}
                seq_bwd: dict[str, set] = {}
                for a, b2 in zip(qtoks, qtoks[1:]):
                    seq_fwd.setdefault(a, set()).add(b2)
                    seq_bwd.setdefault(b2, set()).add(a)
                if seq_fwd:
                    oc = _count_pairs(stream, seq_fwd, None, gaps)
                    uc = _count_pairs(stream, seq_fwd, seq_bwd, gaps)
                    for g in gaps:
                        seq_scores[g] = (
                            float(sum(oc[g].get(x, 0) for x in seq_fwd)),
                            float(sum(uc[g].get(x, 0) for x in seq_fwd)),
                        )
                # ALL query-token pairs (OrderedQueryPairs /
                # UnorderedQueryPairs, gap 8)
                all_fwd: dict[str, set] = {}
                all_bwd: dict[str, set] = {}
                for i2 in range(len(qtoks) - 1):
                    for j2 in range(i2 + 1, len(qtoks)):
                        all_fwd.setdefault(qtoks[i2], set()).add(qtoks[j2])
                        all_bwd.setdefault(qtoks[j2], set()).add(qtoks[i2])
                if all_fwd:
                    oc = _count_pairs(stream, all_fwd, None, (self.window,))
                    uc = _count_pairs(stream, all_fwd, all_bwd, (self.window,))
                    allp_ordered = float(
                        sum(oc[self.window].get(x, 0) for x in all_fwd)
                    )
                    allp_unordered = float(
                        sum(uc[self.window].get(x, 0) for x in all_fwd)
                    )
                sdm = float(_sdm_feature(stream, qtoks))

        # tweet-family counts from the indexed vocabulary (TweetAnalyzer
        # preserves #hashtags and URLs; 0 on non-tweet corpora)
        hashtag_count = float(
            sum(v for t, v in dv.items() if t.startswith("#"))
        )
        link_count = float(
            sum(v for t, v in dv.items() if t.startswith("http"))
        )

        return [
            float(dl), float(len(qtoks)), float(len(matching)),
            float(len(dv)), sum_tf, sum_tf, sum_tf,
            float(bm25), float(tfidf), avg_idf, avg_ictf, scq, sc,
            seq_scores[8][0], seq_scores[8][1],
            seq_scores[6][0], seq_scores[6][1],
            seq_scores[10][0], seq_scores[10][1],
            allp_ordered, allp_unordered,
            sdm, pmi,
            hashtag_count, link_count,
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
        n_computed = len(FEATURE_NAMES) - len(_PASSTHROUGH)
        arr = np.asarray(rows, dtype=np.float64).reshape(len(rows), n_computed)
        cols = [batch["qid"], batch["doc_id"]]
        names = ["qid", "doc_id"]
        if "label" in batch.column_names:  # qrels grade passthrough
            cols.append(batch["label"])
            names.append("label")
        cols += [pa.array(arr[:, i]) for i in range(n_computed)]
        # tweet metadata passthrough features (0 when the column is absent)
        for name in FEATURE_NAMES[n_computed:]:
            if name in batch.column_names:
                cols.append(
                    pa.array(
                        np.asarray(
                            batch[name].to_numpy(zero_copy_only=False),
                            dtype=np.float64,
                        )
                    )
                )
            else:
                cols.append(pa.array(np.zeros(batch.num_rows)))
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

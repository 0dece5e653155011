"""DuckDB mirror of the 28-feature LTR extractor (`pipelines/ltr.py`) —
the deterministic float64 oracle for the `ltr_features` /
`ltr_training_data` driver queries.

Pair selection is the shared deterministic first-pass BM25 (round4 desc,
docid asc; top-5 for features, top-8 for training data, matching
__ray_entry__). Every feature is recomputed in SQL:

- scalar stats (doc_size, counts, sum_tf) — exact integers
- bm25 (round4), tfidf/avg_idf/avg_ictf/scq/simplified_clarity/pmi (round6)
- the CountBigramPairs window counts (gaps 6/8/10 sequential + gap-8
  all-pairs, ordered + unordered with the double-count-on-equal-tokens
  quirk) — positional self-joins over COMPACTED (rank-ordered) analyzed
  positions, exact integers
- the SDM feature with its ported quirks (query-seeded independence
  counts, last-wins pair map, reset-every-token ordered adjacency, the
  asymmetric sliding-window unordered component with its unchecked head
  and tail indices) — round6
- hashtag/link counts and the tweet metadata passthroughs (0 here)

Query-side constants (token lists, pair sets, last-wins pair maps, p(t|q))
are compiled into VALUES at SQL-build time from the same analyzer the
engine uses."""

from __future__ import annotations

from .simple import (
    _ATOKS_CTE,
    _with_transcripts,
    BM25_B,
    BM25_K1,
    SIMPLE_QUERIES,
)

_W = 8  # unordered_window


def _qmeta(queries):
    from ..analysis.analyzer import make_analyzer

    an = make_analyzer()
    meta = []
    for qid, text in queries:
        qtoks = an.analyze(text)
        if not qtoks:
            continue
        counts: dict[str, int] = {}
        for t in qtoks:
            counts[t] = counts.get(t, 0) + 1
        uniq = list(dict.fromkeys(qtoks))
        seq_pairs = sorted({(a, b) for a, b in zip(qtoks, qtoks[1:])})
        all_pairs = sorted(
            {
                (qtoks[i], qtoks[j])
                for i in range(len(qtoks) - 1)
                for j in range(i + 1, len(qtoks))
            }
        )
        pm = {}
        for a, b in zip(qtoks, qtoks[1:]):
            pm[a] = b  # last-wins
        meta.append(
            {
                "qid": qid,
                "qtoks": qtoks,
                "counts": counts,
                "uniq": uniq,
                "seq_pairs": seq_pairs,
                "all_pairs": all_pairs,
                "pm": sorted(pm.items()),
            }
        )
    return meta


def ltr_features_sql(queries=SIMPLE_QUERIES, k: int = 5,
                     with_label: bool = False) -> str:
    meta = _qmeta(queries)
    qlen_vals = ", ".join(f"({m['qid']}, {len(m['qtoks'])})" for m in meta)
    clause_vals = ", ".join(
        f"({m['qid']}, '{t}', {c})"
        for m in meta
        for t, c in m["counts"].items()
    )
    uniq_vals = ", ".join(
        f"({m['qid']}, '{t}', {m['counts'][t] / len(m['qtoks'])!r})"
        for m in meta
        for t in m["uniq"]
    )
    upair_vals = ", ".join(
        f"({m['qid']}, '{a}', '{b}')"
        for m in meta
        for i, a in enumerate(sorted(m["uniq"]))
        for b in sorted(m["uniq"])[i + 1 :]
    ) or "(NULL, NULL, NULL)"
    seq_vals = ", ".join(
        f"({m['qid']}, '{a}', '{b}')"
        for m in meta
        for a, b in m["seq_pairs"]
    ) or "(NULL, NULL, NULL)"
    allp_vals = ", ".join(
        f"({m['qid']}, '{a}', '{b}')"
        for m in meta
        for a, b in m["all_pairs"]
    ) or "(NULL, NULL, NULL)"
    pm_vals = ", ".join(
        f"({m['qid']}, '{a}', '{b}')" for m in meta for a, b in m["pm"]
    ) or "(NULL, NULL, NULL)"
    label_col = (
        ",\n         CAST(CAST(split_part(p.doc_id, ':', 2) AS INTEGER) % 2"
        " AS INTEGER) AS label"
        if with_label
        else ""
    )
    return _with_transcripts(
        _ATOKS_CTE
        + f""",
  stats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
                   CAST(sum(dl) AS BIGINT) AS c FROM adl),
  gdf AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
          FROM atf GROUP BY term),
  qlen(qid, n_toks) AS (VALUES {qlen_vals}),
  q(qid, term, cnt) AS (VALUES {clause_vals}),
  uq(qid, term, pq) AS (VALUES {uniq_vals}),
  upair(qid, t1, t2) AS (VALUES {upair_vals}),
  seqp(qid, t1, t2) AS (VALUES {seq_vals}),
  allp(qid, t1, t2) AS (VALUES {allp_vals}),
  pm(qid, t1, t2) AS (VALUES {pm_vals}),
  first_pass AS (
    SELECT q.qid, atf.doc_id,
           sum(q.cnt * ln(1 + (s.n - gdf.df + 0.5) / (gdf.df + 0.5))
               * atf.tf / (atf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * aqdl.qdl / s.avgdl))
           ) AS score
    FROM q
    JOIN atf ON q.term = atf.term
    JOIN gdf ON gdf.term = q.term
    JOIN aqdl ON aqdl.doc_id = atf.doc_id
    CROSS JOIN stats s
    GROUP BY q.qid, atf.doc_id
  ),
  prs AS (
    SELECT qid, doc_id FROM (
      SELECT qid, doc_id,
             row_number() OVER (
               PARTITION BY qid ORDER BY round(score, 4) DESC, doc_id ASC
             ) AS rn
      FROM first_pass
    ) WHERE rn <= {k}
  ),
  -- compacted positional stream per doc (stopword holes removed)
  pwords AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       x -> x <> '') AS wl
    FROM docs
  ),
  prtoks AS (
    SELECT doc_id, wl[i] AS word, i AS pos
    FROM pwords, unnest(generate_series(1, len(wl))) AS u(i)
  ),
  stoks0 AS (
    SELECT r.doc_id, s.term, r.pos
    FROM prtoks r JOIN stem s ON r.word = s.word
  ),
  strm AS (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS cpos
    FROM stoks0
  ),
  -- per-qid constants
  qconst AS (
    SELECT u.qid,
           round(avg(CASE WHEN g.df > 0 THEN ln(CAST(s.n AS DOUBLE) / g.df)
                     END), 6) AS avg_idf,
           round(avg(CASE WHEN g.cf > 0 THEN ln(CAST(s.c AS DOUBLE) / g.cf)
                     END), 6) AS avg_ictf,
           round(avg(CASE WHEN g.cf > 0 AND g.df > 0
                          THEN (1 + ln(CAST(g.cf AS DOUBLE)))
                               * ln(1 + CAST(s.n AS DOUBLE) / g.df)
                     END), 6) AS scq,
           round(COALESCE(sum(CASE WHEN g.cf > 0
                     THEN u.pq * ln(u.pq / (CAST(g.cf AS DOUBLE) / s.c))
                          / ln(2) END), 0), 6) AS simplified_clarity
    FROM uq u
    LEFT JOIN gdf g ON g.term = u.term
    CROSS JOIN stats s
    GROUP BY u.qid
  ),
  joint AS (
    SELECT up.qid, up.t1, up.t2, count(*) AS df12
    FROM upair up
    JOIN atf a ON a.term = up.t1
    JOIN atf b ON b.term = up.t2 AND b.doc_id = a.doc_id
    GROUP BY 1, 2, 3
  ),
  pmi AS (
    SELECT up.qid,
           round(COALESCE(sum(
             CASE WHEN COALESCE(j.df12, 0) > 0 AND g1.df > 0 AND g2.df > 0
                  THEN ln(CAST(j.df12 * s.n AS DOUBLE) / (g1.df * g2.df))
             END), 0) / count(*), 6) AS pmi
    FROM upair up
    LEFT JOIN joint j ON j.qid = up.qid AND j.t1 = up.t1 AND j.t2 = up.t2
    LEFT JOIN gdf g1 ON g1.term = up.t1
    LEFT JOIN gdf g2 ON g2.term = up.t2
    CROSS JOIN stats s
    WHERE up.t1 IS NOT NULL
    GROUP BY up.qid
  ),
  -- per-(qid, doc) scalars
  base AS (
    SELECT p.qid, p.doc_id, adl.dl, aqdl.qdl,
           ql.n_toks
    FROM prs p
    JOIN adl ON adl.doc_id = p.doc_id
    JOIN aqdl ON aqdl.doc_id = p.doc_id
    JOIN qlen ql ON ql.qid = p.qid
  ),
  match_stats AS (
    SELECT p.qid, p.doc_id,
           count(a.term) AS matching_term_count,
           CAST(COALESCE(sum(a.tf), 0) AS BIGINT) AS sum_tf,
           round(COALESCE(sum(CASE WHEN g.df > 0
                 THEN a.tf * ln(CAST(s.n AS DOUBLE) / g.df) END), 0), 6)
             AS tfidf
    FROM prs p
    JOIN uq u ON u.qid = p.qid
    LEFT JOIN atf a ON a.doc_id = p.doc_id AND a.term = u.term
    LEFT JOIN gdf g ON g.term = u.term
    CROSS JOIN stats s
    GROUP BY p.qid, p.doc_id
  ),
  uniq_doc AS (
    SELECT p.qid, p.doc_id, count(*) AS unique_term_count
    FROM prs p JOIN atf a ON a.doc_id = p.doc_id
    GROUP BY 1, 2
  ),
  bm25f AS (
    SELECT p.qid, p.doc_id,
           round(COALESCE(sum(q.cnt * ln(1 + (s.n - g.df + 0.5) / (g.df + 0.5))
               * a.tf / (a.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * aqdl.qdl / s.avgdl))
           ), 0), 4) AS bm25
    FROM prs p
    JOIN q ON q.qid = p.qid
    JOIN aqdl ON aqdl.doc_id = p.doc_id
    LEFT JOIN atf a ON a.doc_id = p.doc_id AND a.term = q.term
    LEFT JOIN gdf g ON g.term = q.term
    CROSS JOIN stats s
    GROUP BY p.qid, p.doc_id
  ),
  -- window pair counts over the compacted stream
  seq_ord AS (
    SELECT p.qid, p.doc_id,
           count(*) FILTER (s2.cpos - s1.cpos <= 6) AS o6,
           count(*) FILTER (s2.cpos - s1.cpos <= 8) AS o8,
           count(*) FILTER (s2.cpos - s1.cpos <= 10) AS o10
    FROM prs p
    JOIN seqp sp ON sp.qid = p.qid
    JOIN strm s1 ON s1.doc_id = p.doc_id AND s1.term = sp.t1
    JOIN strm s2 ON s2.doc_id = p.doc_id AND s2.term = sp.t2
               AND s2.cpos > s1.cpos AND s2.cpos - s1.cpos <= 10
    GROUP BY 1, 2
  ),
  seq_rev AS (
    SELECT p.qid, p.doc_id,
           count(*) FILTER (s2.cpos - s1.cpos <= 6) AS r6,
           count(*) FILTER (s2.cpos - s1.cpos <= 8) AS r8,
           count(*) FILTER (s2.cpos - s1.cpos <= 10) AS r10
    FROM prs p
    JOIN seqp sp ON sp.qid = p.qid
    JOIN strm s1 ON s1.doc_id = p.doc_id AND s1.term = sp.t2
    JOIN strm s2 ON s2.doc_id = p.doc_id AND s2.term = sp.t1
               AND s2.cpos > s1.cpos AND s2.cpos - s1.cpos <= 10
    GROUP BY 1, 2
  ),
  allp_ord AS (
    SELECT p.qid, p.doc_id, count(*) AS o8
    FROM prs p
    JOIN allp ap ON ap.qid = p.qid
    JOIN strm s1 ON s1.doc_id = p.doc_id AND s1.term = ap.t1
    JOIN strm s2 ON s2.doc_id = p.doc_id AND s2.term = ap.t2
               AND s2.cpos > s1.cpos AND s2.cpos - s1.cpos <= {_W}
    GROUP BY 1, 2
  ),
  allp_rev AS (
    SELECT p.qid, p.doc_id, count(*) AS r8
    FROM prs p
    JOIN allp ap ON ap.qid = p.qid
    JOIN strm s1 ON s1.doc_id = p.doc_id AND s1.term = ap.t2
    JOIN strm s2 ON s2.doc_id = p.doc_id AND s2.term = ap.t1
               AND s2.cpos > s1.cpos AND s2.cpos - s1.cpos <= {_W}
    GROUP BY 1, 2
  ),
  -- SDM components
  sdm_ind AS (
    -- distinct stream tokens: ln((tf+1)/(dl+1)); query tokens absent from
    -- the doc: ln(1/(dl+1)) each
    SELECT p.qid, p.doc_id,
           (SELECT COALESCE(sum(ln((a.tf + 1.0) / (b.dl + 1))), 0)
            FROM atf a WHERE a.doc_id = p.doc_id)
           + (SELECT count(*) FROM uq u
              WHERE u.qid = p.qid AND NOT EXISTS (
                SELECT 1 FROM atf a2
                WHERE a2.doc_id = p.doc_id AND a2.term = u.term))
             * ln(1.0 / (b.dl + 1)) AS ind
    FROM prs p JOIN adl b ON b.doc_id = p.doc_id
  ),
  sdm_ord AS (
    SELECT p.qid, p.doc_id,
           COALESCE(sum(ln((COALESCE(c.cnt, 0) + 1.0) / (b.dl + 1))), 0)
             AS ordv
    FROM prs p
    JOIN adl b ON b.doc_id = p.doc_id
    JOIN pm ON pm.qid = p.qid
    LEFT JOIN (
      SELECT p2.qid, s1.doc_id, pm2.t1, count(*) AS cnt
      FROM prs p2
      JOIN pm pm2 ON pm2.qid = p2.qid
      JOIN strm s1 ON s1.doc_id = p2.doc_id AND s1.term = pm2.t1
      JOIN strm s2 ON s2.doc_id = s1.doc_id AND s2.cpos = s1.cpos + 1
                  AND s2.term = pm2.t2
      GROUP BY 1, 2, 3
    ) c ON c.qid = p.qid AND c.doc_id = p.doc_id AND c.t1 = pm.t1
    WHERE pm.t1 IS NOT NULL
    GROUP BY p.qid, p.doc_id, b.dl
  ),
  -- unordered SDM: centers = cpos 1..min(w-1, n) with window
  -- [1, min(2w+1, n)], plus cpos (k-w) for k in [2w+1, n-1] 0-based ==
  -- cpos in [w+1, n-w-1] with window [cpos-w+1, cpos+w+1]
  sdm_u_counts AS (
    SELECT p.qid, p.doc_id, pm.t1,
           count(*) AS cnt
    FROM prs p
    JOIN pm ON pm.qid = p.qid
    JOIN adl b ON b.doc_id = p.doc_id
    JOIN strm ctr ON ctr.doc_id = p.doc_id AND ctr.term = pm.t1
    WHERE pm.t1 IS NOT NULL
      AND (
        (ctr.cpos <= least({_W} - 1, b.dl)
         AND EXISTS (SELECT 1 FROM strm w2
                     WHERE w2.doc_id = p.doc_id AND w2.term = pm.t2
                       AND w2.cpos <= least(2 * {_W} + 1, b.dl)))
        OR
        (ctr.cpos BETWEEN {_W} + 1 AND b.dl - {_W} - 1
         AND EXISTS (SELECT 1 FROM strm w2
                     WHERE w2.doc_id = p.doc_id AND w2.term = pm.t2
                       AND w2.cpos BETWEEN ctr.cpos - {_W} + 1
                                       AND ctr.cpos + {_W} + 1))
      )
    GROUP BY 1, 2, 3
  ),
  sdm_unord AS (
    SELECT p.qid, p.doc_id,
           COALESCE(sum(ln(greatest(COALESCE(u.cnt, 0), 1) / (b.dl + 1.0))),
                    0) AS unordv
    FROM prs p
    JOIN adl b ON b.doc_id = p.doc_id
    JOIN pm ON pm.qid = p.qid
    LEFT JOIN sdm_u_counts u
      ON u.qid = p.qid AND u.doc_id = p.doc_id AND u.t1 = pm.t1
    WHERE pm.t1 IS NOT NULL
    GROUP BY p.qid, p.doc_id, b.dl
  ),
  tweetc AS (
    SELECT p.qid, p.doc_id,
           CAST(COALESCE(sum(a.tf) FILTER (a.term LIKE '#%'), 0) AS DOUBLE)
             AS hashtag_count,
           CAST(COALESCE(sum(a.tf) FILTER (a.term LIKE 'http%'), 0)
                AS DOUBLE) AS link_count
    FROM prs p LEFT JOIN atf a ON a.doc_id = p.doc_id
    GROUP BY 1, 2
  )
  SELECT CAST(p.qid AS INTEGER) AS qid, p.doc_id{label_col},
         CAST(b.dl AS DOUBLE) AS doc_size,
         CAST(b.n_toks AS DOUBLE) AS query_length,
         CAST(ms.matching_term_count AS DOUBLE) AS matching_term_count,
         CAST(ud.unique_term_count AS DOUBLE) AS unique_term_count,
         CAST(ms.sum_tf AS DOUBLE) AS sum_matching_tf,
         CAST(ms.sum_tf AS DOUBLE) AS sum_term_frequency,
         CAST(ms.sum_tf AS DOUBLE) AS unigrams,
         bf.bm25,
         ms.tfidf,
         COALESCE(qc.avg_idf, 0) AS avg_idf,
         COALESCE(qc.avg_ictf, 0) AS avg_ictf,
         COALESCE(qc.scq, 0) AS scq,
         COALESCE(qc.simplified_clarity, 0) AS simplified_clarity,
         CAST(COALESCE(so.o8, 0) AS DOUBLE) AS ordered_pairs,
         CAST(COALESCE(so.o8, 0) + COALESCE(sr.r8, 0) AS DOUBLE)
           AS unordered_pairs,
         CAST(COALESCE(so.o6, 0) AS DOUBLE) AS ordered_pairs_6,
         CAST(COALESCE(so.o6, 0) + COALESCE(sr.r6, 0) AS DOUBLE)
           AS unordered_pairs_6,
         CAST(COALESCE(so.o10, 0) AS DOUBLE) AS ordered_pairs_10,
         CAST(COALESCE(so.o10, 0) + COALESCE(sr.r10, 0) AS DOUBLE)
           AS unordered_pairs_10,
         CAST(COALESCE(ao.o8, 0) AS DOUBLE) AS ordered_all_pairs,
         CAST(COALESCE(ao.o8, 0) + COALESCE(ar.r8, 0) AS DOUBLE)
           AS unordered_all_pairs,
         round(0.5 * si.ind + 0.2 * COALESCE(sor.ordv, 0)
               + 0.3 * COALESCE(su.unordv, 0), 6) AS sdm,
         COALESCE(pm2.pmi, 0) AS pmi,
         tc.hashtag_count, tc.link_count,
         0.0 AS is_reply, 0.0 AS followers_count, 0.0 AS friends_count
  FROM prs p
  JOIN base b ON b.qid = p.qid AND b.doc_id = p.doc_id
  JOIN match_stats ms ON ms.qid = p.qid AND ms.doc_id = p.doc_id
  JOIN uniq_doc ud ON ud.qid = p.qid AND ud.doc_id = p.doc_id
  JOIN bm25f bf ON bf.qid = p.qid AND bf.doc_id = p.doc_id
  LEFT JOIN qconst qc ON qc.qid = p.qid
  LEFT JOIN pmi pm2 ON pm2.qid = p.qid
  LEFT JOIN seq_ord so ON so.qid = p.qid AND so.doc_id = p.doc_id
  LEFT JOIN seq_rev sr ON sr.qid = p.qid AND sr.doc_id = p.doc_id
  LEFT JOIN allp_ord ao ON ao.qid = p.qid AND ao.doc_id = p.doc_id
  LEFT JOIN allp_rev ar ON ar.qid = p.qid AND ar.doc_id = p.doc_id
  JOIN sdm_ind si ON si.qid = p.qid AND si.doc_id = p.doc_id
  LEFT JOIN sdm_ord sor ON sor.qid = p.qid AND sor.doc_id = p.doc_id
  LEFT JOIN sdm_unord su ON su.qid = p.qid AND su.doc_id = p.doc_id
  JOIN tweetc tc ON tc.qid = p.qid AND tc.doc_id = p.doc_id
  ORDER BY qid, p.doc_id"""
    )

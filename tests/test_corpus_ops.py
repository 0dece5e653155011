"""Decontamination + deterministic hash split (stages/corpus_ops.py)."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def _ds(rows):
    return ray.data.from_arrow(pa.table(rows))


def test_decontaminate_flags_overlap(ray_session):
    from anserini_ray.stages.corpus_ops import decontaminate

    docs = _ds(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps",   # shares shingles with bench
                "completely different words here now",
                "quick brown fox somewhere else",  # shares 'quick brown fox'
                "",                            # empty -> 0 overlap
            ],
        }
    )
    out = {r["doc_id"]: r for r in decontaminate(
        docs, ["the quick brown fox ran"], n=3
    ).take_all()}
    assert out[1]["contaminated"] and out[1]["n_overlap"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert out[3]["contaminated"]  # 'quick brown fox' shingle shared
    assert not out[4]["contaminated"]
    assert len(out) == 4


def test_hash_split_deterministic_and_proportional(ray_session):
    from anserini_ray.stages.corpus_ops import hash_split

    n = 5000
    docs = _ds({"doc_id": list(range(n))})
    rows = hash_split(docs).take_all()
    assert len(rows) == n
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], 0)
        by_split[r["split"]] += 1
        # bucket matches an independent md5 computation
        expect = int.from_bytes(
            hashlib.md5(str(r["doc_id"]).encode()).digest()[:2], "big"
        ) % 100
        assert r["bucket"] == expect
        assert r["split"] == (
            "train" if expect < 80 else "val" if expect < 90 else "test"
        )
    # proportions roughly 80/10/10
    assert abs(by_split["train"] / n - 0.80) < 0.03
    assert abs(by_split["val"] / n - 0.10) < 0.02
    assert abs(by_split["test"] / n - 0.10) < 0.02
    # rerun identical (determinism across executions)
    rows2 = hash_split(docs).take_all()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_pack_sequences_greedy_contract(ray_session):
    from anserini_ray.stages.corpus_ops import pack_sequences

    docs = _ds(
        {
            "doc_id": [0, 1, 2, 3, 4, 1024],
            "text": [
                "a b c",            # 3
                "d e f g",          # 4  -> seq 0 (3+4=7 <= 8)
                "h i",              # 2  -> seq 1 (7+2 > 8)
                " ".join(["x"] * 12),  # 12 > budget -> own seq 2
                "y",                # 1  -> seq 3 (new after oversized)
                "z z z",            # different group -> seq 0
            ],
        }
    )
    rows = {r["doc_id"]: r for r in pack_sequences(
        docs, budget=8, group_size=1024
    ).take_all()}
    assert rows[0]["seq_idx"] == 0 and rows[1]["seq_idx"] == 0
    assert rows[2]["seq_idx"] == 1
    assert rows[3]["seq_idx"] == 2 and rows[3]["n_tokens"] == 12
    assert rows[4]["seq_idx"] == 3
    assert rows[1024]["pack_group"] == 1 and rows[1024]["seq_idx"] == 0
    # per-sequence token totals never exceed the budget except for
    # single-oversized-document sequences
    import collections
    per_seq = collections.defaultdict(list)
    for r in rows.values():
        per_seq[(r["pack_group"], r["seq_idx"])].append(r["n_tokens"])
    for toks in per_seq.values():
        assert sum(toks) <= 8 or len(toks) == 1

def test_pack_sequences_sorted_fast_path(ray_session, tmp_path):
    """Sorted-path == shuffle-path on multi-file id-sorted parquet with a
    pack group SPANNING a file boundary; the plan has no all-to-all."""
    import pyarrow.parquet as pq
    from anserini_ray.stages.corpus_ops import (
        pack_sequences,
        pack_sequences_sorted,
    )

    rng = np.random.default_rng(7)
    n = 3000
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, size=n)]
    ids = np.arange(n, dtype=np.int64)
    # three files; boundaries NOT multiples of group_size=256 -> groups span
    cuts = [0, 1000, 2100, n]
    paths = []
    for i in range(3):
        t = pa.table({
            "doc_id": ids[cuts[i]:cuts[i + 1]],
            "text": texts[cuts[i]:cuts[i + 1]],
        })
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p, row_group_size=400)
        paths.append(p)

    fast = pack_sequences_sorted(
        paths, budget=64, group_size=256, unit_target_rows=500
    )
    stats_ds = fast.materialize()
    slow = pack_sequences(
        ray.data.read_parquet(paths), budget=64, group_size=256
    )
    f = {r["doc_id"]: (r["pack_group"], r["seq_idx"], r["n_tokens"])
         for r in stats_ds.take_all()}
    s = {r["doc_id"]: (r["pack_group"], r["seq_idx"], r["n_tokens"])
         for r in slow.take_all()}
    assert f == s and len(f) == n
    # no all-to-all on the fast path (group-aligned units, from_arrow_refs)
    st = stats_ds.stats()
    assert "Aggregate" not in st and "Sort" not in st, st


def test_pack_sequences_sorted_guards(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest
    from anserini_ray.stages.corpus_ops import pack_sequences_sorted

    # overlapping id ranges across files -> refuse
    pq.write_table(pa.table({"doc_id": [0, 5], "text": ["a", "b"]}),
                   str(tmp_path / "a.parquet"))
    pq.write_table(pa.table({"doc_id": [3, 9], "text": ["c", "d"]}),
                   str(tmp_path / "b.parquet"))
    with pytest.raises(ValueError, match="overlap|unsorted"):
        pack_sequences_sorted(
            [str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")]
        )
    # intra-row-group disorder -> task-side refusal
    pq.write_table(pa.table({"doc_id": [4, 2, 8], "text": ["a", "b", "c"]}),
                   str(tmp_path / "c.parquet"))
    with pytest.raises(Exception, match="sorted"):
        pack_sequences_sorted([str(tmp_path / "c.parquet")]).take_all()


def test_pack_sequences_analyzer_tokenizer(ray_session, tmp_path):
    """tokenizer='analyzer' counts via the analyzer fast path (punctuation
    does not inflate counts the way bare split() does) on BOTH paths."""
    import pyarrow.parquet as pq
    from anserini_ray.stages.corpus_ops import (
        pack_sequences,
        pack_sequences_sorted,
    )

    t = pa.table({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["one, two; three!", "a.b.c", "", "x " * 5],
    })
    p = str(tmp_path / "d.parquet")
    pq.write_table(t, p)
    fast = {r["doc_id"]: r["n_tokens"] for r in pack_sequences_sorted(
        [p], budget=8, tokenizer="analyzer").take_all()}
    slow = {r["doc_id"]: r["n_tokens"] for r in pack_sequences(
        ray.data.read_parquet(p), budget=8, tokenizer="analyzer").take_all()}
    assert fast == slow
    assert fast[0] == 3 and fast[2] == 0


def test_repetition_stats(ray_session):
    from anserini_ray.stages.text_stats import repetition_batch

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b a b a b",          # bigram 'a b' 3/5, 'b a' 2/5
            "x y z",                # all distinct
            "w w w w",              # fully repeated
            "",                      # empty
        ],
    })
    rows = {r["doc_id"]: r for r in repetition_batch(t).to_pylist()}
    assert abs(rows[0]["top_bigram_frac"] - 3 / 5) < 1e-12
    assert abs(rows[0]["dup_token_frac"] - (1 - 2 / 6)) < 1e-12
    assert rows[1]["dup_token_frac"] == 0.0
    assert abs(rows[1]["top_bigram_frac"] - 0.5) < 1e-12  # 2 distinct of 2
    assert rows[2]["top_bigram_frac"] == 1.0
    assert rows[2]["top_trigram_frac"] == 1.0
    assert abs(rows[2]["dup_token_frac"] - 0.75) < 1e-12
    assert rows[3]["dup_token_frac"] == 0.0 == rows[3]["top_bigram_frac"]


def test_pii_redact(ray_session):
    from anserini_ray.stages.text_stats import PiiRedact

    t = pa.table({
        "doc_id": [0, 1, 2],
        "text": [
            "mail bob.smith+x@example.co.uk or call 555-123-4567 now",
            "server at 192.168.0.1 and 10.0.0.255, no mail",
            "clean text without identifiers",
        ],
    })
    rows = {r["doc_id"]: r for r in PiiRedact()(t).to_pylist()}
    assert rows[0]["text_redacted"] == "mail <EMAIL> or call <PHONE> now"
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 1
    assert rows[1]["text_redacted"] == "server at <IP> and <IP>, no mail"
    assert rows[1]["n_ips"] == 2
    assert rows[2]["text_redacted"] == "clean text without identifiers"
    # DuckDB regexp parity on the SAME planted rows (the engine-level oracle
    # corpus has no PII, so assert the cross-engine contract here)
    import duckdb

    from anserini_ray.pipelines.training_data import _pii_sql

    con = duckdb.connect()
    con.register("documents", t)
    for r in con.execute(_pii_sql()).fetchall():
        got = rows[r[0]]
        assert (got["text_redacted"], got["n_emails"], got["n_ips"],
                got["n_phones"]) == (r[1], r[2], r[3], r[4])


def test_quality_filter_reasons(ray_session):
    from anserini_ray.stages import text_stats as T

    stop_pad = "the a an of to in on is are and"  # 10 stopwords
    long_ok = stop_pad + " " + " ".join(f"word{i:04d}" for i in range(30))
    t = pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            long_ok,                                   # keep
            "too short",                               # too_few_tokens
            " ".join(f"word{i:04d}" for i in range(40)),  # too_few_stopwords
            stop_pad + " duplicate" * 30,              # dup_tokens
            stop_pad + " " + "xxxx yyyy " * 20,        # dup beats bigram order
        ],
    })
    rows = {r["doc_id"]: r for r in T.quality_filter_batch(t).to_pylist()}
    assert rows[0]["keep"] and rows[0]["reason"] == ""
    assert rows[1]["reason"] == "too_few_tokens"
    assert rows[2]["reason"] == "too_few_stopwords"
    assert rows[3]["reason"] == "dup_tokens"
    assert not rows[4]["keep"]


def test_chunk_batch_boundaries(ray_session):
    from anserini_ray.stages.text_stats import chunk_batch

    toks = lambda n: " ".join(f"t{i}" for i in range(n))
    t = pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [toks(5), toks(8), toks(9), toks(20), ""],
    })
    out = chunk_batch(t, chunk_tokens=8, overlap=2).to_pylist()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 5 tokens -> 1 chunk; 8 -> 1; 9 -> 2 (stride 6); 20 -> 3; empty -> none
    assert [len(by_doc.get(d, [])) for d in range(5)] == [1, 1, 2, 3, 0]
    c = by_doc[2]
    assert c[0]["chunk_text"].split() == [f"t{i}" for i in range(8)]
    assert c[1]["chunk_text"].split() == [f"t{i}" for i in range(6, 9)]
    assert c[1]["n_chunk_tokens"] == 3
    # every token of doc 3 is covered, consecutive chunks overlap by 2
    c3 = by_doc[3]
    assert c3[0]["chunk_text"].split()[-2:] == c3[1]["chunk_text"].split()[:2]
    covered = set()
    for r in c3:
        covered.update(r["chunk_text"].split())
    assert covered == {f"t{i}" for i in range(20)}


def test_ngram_counts_sql_parity(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from anserini_ray.pipelines import training_data as TD

    t = pa.table({
        "doc_id": list(range(4)),
        "text": ["a b c a b", "b c a b", "x y", ""],
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = TD.ngram_counts(str(d)).to_pylist()
    con = duckdb.connect()
    con.register("documents", t)
    want = [{"gram": g, "n": n}
            for g, n in con.execute(TD.NGRAM_COUNTS_SQL).fetchall()]
    assert got == want
    assert got[0] == {"gram": "a b", "n": 3}

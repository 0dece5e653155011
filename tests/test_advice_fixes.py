"""Round-2 robustness fixes from review advice: CRLF/byte-exact WARC
parsing, Wikipedia redirect skip + newline-run collapse, optimize-swap crash
recovery and mixed positional-run handling."""

import os
import shutil

import pytest


def test_warc_crlf_and_multibyte_bodies():
    from anserini_ray.sources.web_collections import parse_warc

    # spec-conformant WARC/1.0 with CRLF header terminators and a body whose
    # BYTE length differs from its character length (non-ASCII)
    body1 = "HTTP/1.1 200 OK\r\nContent-Length: 10\r\n\r\n<p>héllo</p>"
    b1 = body1.encode("utf-8")
    rec1 = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-TREC-ID: clueweb12-0000wb-00-00001\r\n"
        b"Content-Length: " + str(len(b1)).encode() + b"\r\n"
        b"\r\n" + b1 + b"\r\n\r\n"
    )
    body2 = "HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\n<div>ok</div>"
    b2 = body2.encode()
    rec2 = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-TREC-ID: clueweb12-0000wb-00-00002\r\n"
        b"Content-Length: " + str(len(b2)).encode() + b"\r\n"
        b"\r\n" + b2 + b"\r\n\r\n"
    )
    recs = parse_warc(rec1 + rec2, "WARC/1.0")
    assert [r[0] for r in recs] == [
        "clueweb12-0000wb-00-00001", "clueweb12-0000wb-00-00002",
    ]
    assert recs[0][1] == "response"
    # byte-exact body slicing: record 1's body survives the non-ASCII char
    assert recs[0][2] == body1
    assert recs[1][2] == body2


def test_warc_lf_still_parses():
    from anserini_ray.sources.web_collections import parse_warc

    body = b"content here"
    rec = (
        b"WARC/0.18\nWARC-Type: response\nWARC-TREC-ID: x1\n"
        b"Content-Length: " + str(len(body)).encode() + b"\n\n" + body
    )
    recs = parse_warc(rec, "WARC/0.18")
    assert recs == [("x1", "response", "content here")]


def test_wikipedia_redirect_skip_and_newline_runs():
    from anserini_ray.sources.wikipedia_collection import parse_wikipedia

    dump = """
<mediawiki>
<page><title>Real Article</title><ns>0</ns>
<revision><text>First line.


Second line after blank lines.</text></revision></page>
<page><title>Some Redirect</title><ns>0</ns>
<revision><text>#REDIRECT [[Real Article]]</text></revision></page>
</mediawiki>
""".encode()
    docs = parse_wikipedia(dump)
    titles = [t for t, _ in docs]
    assert titles == ["Real Article"]  # redirect page skipped
    # newline RUNS collapse to a single space each (replaceAll("\n+"," "))
    assert docs[0][1] == (
        "Real Article.\nFirst line. Second line after blank lines."
    )


def test_optimize_crash_recovery(ray_session, tmp_path):
    import ray.data

    from anserini_ray.index import IndexConfig, build_index
    from anserini_ray.index.optimize import recover_interrupted_optimize
    from anserini_ray.search import LocalSearcher
    from anserini_ray.sources import generate_transcripts

    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(generate_transcripts(500, seed=9)),
        idx,
        IndexConfig(seg_shift=8, assume_sorted=True),
        input_files=[],
    )
    before = LocalSearcher(idx).search("merge sort", k=5)
    # simulate a crash between the two os.replace calls of the swap
    os.rename(os.path.join(idx, "postings"), os.path.join(idx, "postings.old"))
    assert not os.path.isdir(os.path.join(idx, "postings"))
    s = LocalSearcher(idx)  # reader recovers transparently
    after = s.search("merge sort", k=5)
    assert before[0] == after[0]
    assert os.path.isdir(os.path.join(idx, "postings"))
    assert not recover_interrupted_optimize(idx)  # nothing left to recover


def test_optimize_mixed_positional_runs_drop_positions(ray_session):
    import numpy as np
    import pyarrow as pa

    from anserini_ray.index.build import _encode_term_run
    from anserini_ray.index.optimize import _concat_group as _compact_group
    from anserini_ray.index.varint import varint_encode

    def run_row(first, n, with_pos):
        ords = np.arange(first, first + n, dtype=np.uint64)
        tfs = np.ones(n, dtype=np.uint64)
        dls = np.full(n, 5, dtype=np.int32)
        (db, tb, bf, bn, bmt, bmd, bdo, bto) = _encode_term_run(
            ords, tfs, dls, 128
        )
        pos = varint_encode(np.ones(n, dtype=np.uint64)) if with_pos else b""
        return {
            "segment_id": 0, "term": "t", "first_local": first, "df": n,
            "cf": n, "max_tf": 1, "doc_blob": db, "tf_blob": tb,
            "blk_first": bf.tolist(), "blk_n": bn.tolist(),
            "blk_max_tf": bmt.tolist(), "blk_min_dl": bmd.tolist(),
            "blk_doc_off": bdo.tolist(), "blk_tf_off": bto.tolist(),
            "pos_blob": pos,
        }

    mixed = pa.Table.from_pylist([run_row(0, 4, True), run_row(10, 3, False)])
    out = _compact_group(mixed)
    assert out["df"][0].as_py() == 7
    assert out["pos_blob"][0].as_py() == b""  # mixed -> positions dropped

    both = pa.Table.from_pylist([run_row(0, 4, True), run_row(10, 3, True)])
    out2 = _compact_group(both)
    assert len(out2["pos_blob"][0].as_py()) > 0


def test_ann_partial_topk_respects_rounded_tie_boundary(ray_session):
    """Round-4 ADVICE fix: per-batch partial top-k must select by the FINAL
    ranking key (rounded cosine desc, id asc), not raw cosine — a doc tied at
    the rounded k-th boundary with a smaller id must win even when its raw
    cosine is lower."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from anserini_ray.stages.ann import brute_force_cosine_topk, ivf_topk

    def vec(c):  # unit vector at cosine c to the query [1, 0]
        return [c, float(np.sqrt(1.0 - c * c))]

    # id=10 has the higher RAW cosine; both round to 0.5000 at 4 decimals,
    # so the final key prefers id=3. Old raw-cosine argpartition kept id=10.
    tbl = pa.table(
        {
            "vec_id": pa.array([10, 3], type=pa.int64()),
            "embedding": [vec(0.50004), vec(0.50001)],
        }
    )
    ds = ray.data.from_arrow(tbl)  # one batch -> the per-batch truncation path
    q = np.array([[1.0, 0.0]])

    out = brute_force_cosine_topk(ds, q, k=1, round_decimals=4)
    assert out["vec_id"].to_pylist() == [3]
    assert out["cosine"].to_pylist() == [0.5]

    # degenerate-exact IVF (nprobe == nlist) shares the same selection path
    out_ivf = ivf_topk(
        ds, q, k=1, nlist=1, nprobe=1,
        centroids=np.array([[1.0, 0.0]]), round_decimals=4,
    )
    assert out_ivf["vec_id"].to_pylist() == [3]

"""Property-based tests (hypothesis): codec roundtrips, analyzer robustness,
norm monotonicity, ties-adjust order preservation."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anserini_ray.analysis import Analyzer, porter_stem, tokenize
from anserini_ray.index.varint import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from anserini_ray.search.norms import int_to_byte4, quantize_lengths
from anserini_ray.search.ties import adjust_score_ties


@given(st.lists(st.integers(min_value=0, max_value=2**34 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    v = np.asarray(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(v)).tolist() == vals


@given(
    st.sets(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=300),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(ords, data):
    o = np.asarray(sorted(ords), dtype=np.uint64)
    tfs = np.asarray(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=1000),
                min_size=len(o),
                max_size=len(o),
            )
        ),
        dtype=np.uint64,
    )
    db, tb = encode_postings(o, tfs)
    o2, t2 = decode_postings(db, tb, len(o))
    assert o2.tolist() == o.tolist()
    assert t2.tolist() == tfs.tolist()


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_analyzer_never_crashes_and_tokens_nonempty(text):
    a = Analyzer()
    toks = a.analyze(text)
    assert all(t for t in toks)
    # tokenization is deterministic
    assert toks == Analyzer().analyze(text)


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), max_size=30))
@settings(max_examples=300, deadline=None)
def test_porter_output_stable(word):
    s1 = porter_stem(word)
    assert isinstance(s1, str)
    assert porter_stem(word) == s1


@given(st.integers(min_value=0, max_value=2**30))
@settings(max_examples=300, deadline=None)
def test_norm_quantization_properties(dl):
    q = int(quantize_lengths(np.array([dl]))[0])
    assert 0 <= q <= dl  # truncating, never over
    assert 0 <= int_to_byte4(dl) <= 255
    # monotone
    q2 = int(quantize_lengths(np.array([dl + 1]))[0])
    assert q2 >= q


@given(
    st.lists(
        st.floats(min_value=0.0, max_value=8.0, allow_nan=False, width=32),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_ties_adjust_strictly_decreasing(scores):
    # Strict decrease only holds where float32 can represent the 1e-6
    # perturbation (|score| < ~16) — a limitation FAITHFUL to the reference
    # (ScoreTiesAdjusterReranker.java's own comment on float precision);
    # typical BM25 scores sit well inside this range. Ties runs also cap at
    # ~64 before dup*1e-6 escapes the 1e-4 rounding bucket.
    ranked = np.sort(np.asarray(scores, dtype=np.float32))[::-1]
    adj = adjust_score_ties(ranked)
    assert all(
        adj[i] > adj[i + 1] or ranked[i] - ranked[i + 1] > 1e-4
        for i in range(len(adj) - 1)
    )
    # order never inverted
    assert all(adj[i] >= adj[i + 1] for i in range(len(adj) - 1))

"""Misra–Gries heavy-hitter sketch (anserini_ray/stages/sketch.py):
streaming-update semantics, the mergeable-summaries guarantee in the
approximate regime, and exactness (== DuckDB oracle) in the degenerate
capacity >= distinct-items configuration."""

from collections import Counter

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def test_mg_update_decrement_semantics():
    from anserini_ray.stages.sketch import mg_update

    c: dict = {}
    # capacity 2: stream a a b c -> c arrives full, decrements a and b
    n = mg_update(c, ["a", "a", "b", "c"], capacity=2)
    assert n == 4
    assert c == {"a": 1}  # a:2,b:1 -> decrement all -> a:1, b dropped, c not added


def test_mg_merged_guarantee_property():
    from anserini_ray.stages.sketch import mg_merge_tables, mg_update

    rng = np.random.default_rng(17)
    capacity = 32
    # skewed stream: zipf-ish over 500 distinct items
    items = [f"i{int(v)}" for v in rng.zipf(1.3, size=20_000) % 500]
    true = Counter(items)
    n_total = len(items)
    # 8 chunk summaries merged pairwise through the table-merge path
    chunks = [items[i::8] for i in range(8)]
    parts = []
    for ch in chunks:
        c: dict = {}
        n = mg_update(c, ch, capacity)
        parts.append(
            pa.table(
                {
                    "gram": pa.array(list(c.keys()) + [None], type=pa.string()),
                    "n": pa.array(list(c.values()) + [n], type=pa.int64()),
                }
            )
        )
    merged = mg_merge_tables(pa.concat_tables(parts), capacity)
    grams = merged["gram"].to_pylist()
    counts = merged["n"].to_pylist()
    est = {g: c for g, c in zip(grams, counts) if g is not None}
    n_seen = sum(c for g, c in zip(grams, counts) if g is None)
    assert n_seen == n_total
    bound = n_total / (capacity + 1)
    for g, e in est.items():
        assert e <= true[g] <= e + bound
    for g, t in true.items():  # no false negatives among heavy items
        if t > bound:
            assert g in est, f"heavy item {g} (count {t} > {bound}) missing"


def test_heavy_hitters_exact_matches_oracle(ray_session, sf_dir):
    from anserini_ray.pipelines import training_data as TD

    mine = TD.heavy_hitters(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    ref = con.execute(TD.HEAVY_HITTERS_SQL).fetch_df()
    cols = sorted(mine.columns)
    assert cols == sorted(ref.columns)
    a = list(map(tuple, mine[cols].itertuples(index=False)))
    b = list(map(tuple, ref[cols].itertuples(index=False)))
    assert a == b  # ordered: both sort (est desc, gram asc)


def test_heavy_hitters_approximate_regime(ray_session):
    import ray.data

    from anserini_ray.stages.sketch import heavy_hitters

    # one dominant bigram + long tail; capacity far below distinct count
    texts = ["the cat " * 50] * 20 + [f"tail{i} word{i} x{i} y{i}" for i in range(300)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    out = heavy_hitters(ds, capacity=16, k=5, merge_tasks=2).to_pandas()
    n_total = int(out["n_total"].iloc[0])
    row = out[out["gram"] == "the cat"]
    assert not row.empty, "dominant bigram must be reported"
    # per doc: tokens [the,cat]*50 -> 'the cat' occurs 50 times
    est, mx = int(row["est_count"].iloc[0]), int(row["max_count"].iloc[0])
    assert est <= 20 * 50 <= mx


def test_batch_summary_matches_reference_update():
    """The vectorized per-block stage must produce a summary at least as
    tight as the reference mg_update loop (an exact count table compressed
    once accrues no more error than streaming decrements), obey the
    capacity bound, and agree exactly when capacity >= distinct grams."""
    import numpy as np
    import pyarrow as pa

    from anserini_ray.stages.sketch import _batch_summary, _ngram_array

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(300)
    ] + ["", "   ", None, "solo", "  spaced   out  tokens "]
    arr = pa.array(texts, type=pa.string())

    # gram extraction == the Python reference
    ref_grams = []
    for t in texts:
        toks = (t or "").lower().split()
        ref_grams += [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
    got = _ngram_array(arr, 2).to_pylist()
    assert sorted(got) == sorted(ref_grams)

    # degenerate-exact: capacity >= distinct -> exact counts + N row
    from collections import Counter

    exact = Counter(ref_grams)
    s = _batch_summary(arr, 2, capacity=10_000)
    d = {g: c for g, c in zip(s["gram"].to_pylist(), s["n"].to_pylist())}
    n_row = d.pop(None)
    assert n_row == len(ref_grams)
    assert d == dict(exact)

    # compressed regime: capacity bound + MG estimate bounds hold
    cap = 16
    s2 = _batch_summary(arr, 2, capacity=cap)
    d2 = {g: c for g, c in zip(s2["gram"].to_pylist(), s2["n"].to_pylist())}
    n2 = d2.pop(None)
    assert n2 == len(ref_grams)
    assert len(d2) <= cap
    err = len(ref_grams) // (cap + 1)
    for g, est in d2.items():
        assert est <= exact[g] <= est + err
    for g, c in exact.items():  # every true heavy hitter is reported
        if c > err:
            assert g in d2

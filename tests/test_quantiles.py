"""Exact distributed quantiles (length_quantiles): interpolation semantics
and DuckDB quantile_cont parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_length_quantiles_matches_numpy(ray_session, tmp_path):
    from anserini_ray.pipelines import training_data as TD

    rng = np.random.default_rng(5)
    lens = rng.integers(0, 50, size=311)
    texts = [" ".join(["w"] * int(n)) for n in lens]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"),
    )
    out = TD.length_quantiles(str(tmp_path)).to_pandas()
    for q, v in zip(out["q"], out["val"]):
        # numpy 'linear' == quantile_cont interpolation
        assert v == pytest.approx(
            round(float(np.percentile(lens, 100 * q, method="linear")), 6)
        )


def test_length_quantiles_oracle_parity(ray_session, sf_dir):
    from anserini_ray.pipelines import training_data as TD

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    mine = TD.length_quantiles(sf_dir).to_pandas()
    ref = con.execute(TD.LENGTH_QUANTILES_SQL).fetch_df()
    assert sorted(mine.columns) == sorted(ref.columns)
    a = mine.sort_values("q").reset_index(drop=True)
    b = ref.sort_values("q").reset_index(drop=True)
    assert a["val"].tolist() == b["val"].tolist()


def test_length_quantiles_empty_and_null_text(ray_session, tmp_path):
    """ADVICE r4 (low): n==0 must not crash (all-null vals), and null-text
    rows count as 0 tokens on both the Ray side and the SQL oracle."""
    from anserini_ray.pipelines import training_data as TD

    empty_dir = tmp_path / "empty"
    empty_dir.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())}),
        str(empty_dir / "documents.parquet"),
    )
    out = TD.length_quantiles(str(empty_dir)).to_pandas()
    assert len(out) == 7 and out["val"].isna().all()

    null_dir = tmp_path / "nulls"
    null_dir.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "text": pa.array(["a b c", None, "d e", None])}),
        str(null_dir / "documents.parquet"),
    )
    mine = TD.length_quantiles(str(null_dir)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{null_dir}/documents.parquet')"
    )
    ref = con.execute(TD.LENGTH_QUANTILES_SQL).fetch_df()
    a = mine.sort_values("q").reset_index(drop=True)
    b = ref.sort_values("q").reset_index(drop=True)
    assert a["val"].tolist() == b["val"].tolist()

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

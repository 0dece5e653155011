"""Temporal operators: gap sessionization, as-of join, range join
(anserini_ray/stages/temporal.py) — edge semantics on hand-built fixtures
plus DuckDB-oracle parity on the sf0.001 events table."""

import duckdb
import pyarrow as pa
import pytest

US = 1_000_000
H = 3600 * US


def _ts(sec):
    # timestamp[us] from epoch seconds
    return pa.scalar(int(sec * US), type=pa.timestamp("us"))


def _events_table(rows):
    """rows: (event_id, sec, user_id, event_type, value)"""
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.int64()),
            pa.array([int(r[1] * US) for r in rows], type=pa.timestamp("us")),
            pa.array([r[2] for r in rows], type=pa.int64()),
            pa.array([r[3] for r in rows], type=pa.string()),
            pa.array([float(r[4]) for r in rows], type=pa.float64()),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(_events_table(rows))


def _rowset(ds):
    t = ds.to_pandas()
    return sorted(map(tuple, t[sorted(t.columns)].itertuples(index=False)))


def test_sessionize_gap_boundary(ray_session):
    from anserini_ray.stages.temporal import sessionize

    gap = 100 * US
    rows = [
        # user 1: gaps exactly == gap stay in-session; > gap breaks
        (1, 0, 1, "view", 0),
        (2, 100, 1, "view", 0),   # diff == gap -> same session
        (3, 201, 1, "view", 0),   # diff 101 > gap -> new session
        # user 2: single event
        (4, 0, 2, "view", 0),
    ]
    out = {
        (r["event_id"]): (r["user_id"], r["session_idx"], r["session_seq"])
        for r in sessionize(_ds(rows), gap).take_all()
    }
    assert out == {
        1: (1, 0, 0),
        2: (1, 0, 1),
        3: (1, 1, 0),
        4: (2, 0, 0),
    }


def test_sessionize_tie_order_by_event_id(ray_session):
    from anserini_ray.stages.temporal import sessionize

    rows = [(10, 5, 1, "view", 0), (9, 5, 1, "view", 0), (11, 500, 1, "view", 0)]
    out = {
        r["event_id"]: (r["session_idx"], r["session_seq"])
        for r in sessionize(_ds(rows), 100 * US).take_all()
    }
    # equal ts ordered by event_id asc; 11 is 495s later -> new session
    assert out == {9: (0, 0), 10: (0, 1), 11: (1, 0)}


def test_session_stats(ray_session):
    from anserini_ray.stages.temporal import session_stats

    rows = [
        (1, 0, 1, "view", 1.5),
        (2, 50, 1, "view", 2.25),
        (3, 1000, 1, "view", 4.0),
        (4, 0, 2, "view", 8.0),
    ]
    got = _rowset(session_stats(_ds(rows), 100 * US))
    # columns sorted: duration_us, n_events, session_idx, sum_value, user_id
    assert got == sorted(
        [
            (50 * US, 2, 0, 3.75, 1),
            (0, 1, 1, 4.0, 1),
            (0, 1, 0, 8.0, 2),
        ]
    )


def test_asof_join_semantics(ray_session):
    from anserini_ray.stages.temporal import asof_join

    rows = [
        (1, 10, 1, "click", 0),
        (2, 20, 1, "click", 0),
        (3, 20, 1, "click", 0),    # tie with 2 at ts=20 -> id 3 wins
        (4, 20, 1, "purchase", 0),  # r.ts <= l.ts inclusive -> matches 3
        (5, 30, 1, "purchase", 0),  # latest click at 20 -> 3
        (6, 5, 2, "purchase", 0),   # user 2 has no click -> -1
    ]
    out = {
        r["event_id"]: (r["matched_event_id"], r["lag_us"])
        for r in asof_join(_ds(rows), "purchase", "click").take_all()
    }
    assert out == {4: (3, 0), 5: (3, 10 * US), 6: (-1, -1)}


def test_range_count_join_inclusive_bounds(ray_session):
    from anserini_ray.stages.temporal import range_count_join

    w = 10 * US
    rows = [
        (1, 100, 1, "click", 1.0),   # exactly l.ts - w -> included
        (2, 105, 1, "click", 2.0),
        (3, 110, 1, "click", 4.0),   # exactly l.ts -> included
        (4, 99.999999, 1, "click", 8.0),  # 1us before window -> excluded
        (5, 110, 1, "error", 0),
        (6, 0, 2, "error", 0),       # no clicks for user 2
    ]
    out = {
        r["event_id"]: (r["n_in_window"], r["sum_value_in_window"])
        for r in range_count_join(_ds(rows), "error", "click", w).take_all()
    }
    assert out == {5: (3, 7.0), 6: (0, 0.0)}


@pytest.mark.parametrize(
    "qname",
    ["events_sessionized", "session_stats", "events_asof", "events_range_join"],
)
def test_temporal_oracle_parity_sf0001(ray_session, sf_dir, qname):
    from anserini_ray.pipelines import training_data as TD

    fn = getattr(TD, qname)
    sql = getattr(TD, f"{qname.upper()}_SQL")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    )
    mine = fn(sf_dir).to_pandas()
    ref = con.execute(sql).fetch_df()
    cols = sorted(mine.columns)
    assert cols == sorted(ref.columns)
    a = sorted(map(tuple, mine[cols].itertuples(index=False)))
    b = sorted(map(tuple, ref[cols].itertuples(index=False)))
    assert len(a) == len(b) and a == b

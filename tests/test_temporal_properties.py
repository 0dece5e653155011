"""Property tests for the temporal operators: random event sets (with
deliberate timestamp ties and hot users) vs brute-force per-user Python
references."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

US = 1_000_000

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),          # user_id (few users -> dense histories)
        st.integers(0, 40),         # ts seconds (small range -> many ties)
        st.sampled_from(["l", "r", "x"]),
        st.integers(0, 100),        # value (scaled /4 -> exact doubles)
    ),
    min_size=0,
    max_size=60,
)


def _table(raw):
    # event_id = position (unique); ties in ts are frequent by construction
    return pa.Table.from_arrays(
        [
            pa.array(range(len(raw)), type=pa.int64()),
            pa.array([int(r[1] * US) for r in raw], type=pa.timestamp("us")),
            pa.array([r[0] for r in raw], type=pa.int64()),
            pa.array([r[2] for r in raw], type=pa.string()),
            pa.array([r[3] / 4.0 for r in raw], type=pa.float64()),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )


def _by_user(raw):
    out = {}
    for eid, (u, sec, typ, val) in enumerate(raw):
        out.setdefault(u, []).append((sec * US, eid, typ, val / 4.0))
    for u in out:
        out[u].sort()  # (ts, event_id)
    return out


@settings(max_examples=25, deadline=None)
@given(events_strategy)
def test_sessionize_property(ray_session, raw):
    import ray.data

    from anserini_ray.stages.temporal import sessionize

    gap = 5 * US
    got = {
        r["event_id"]: (r["user_id"], r["session_idx"], r["session_seq"])
        for r in sessionize(ray.data.from_arrow(_table(raw)), gap).take_all()
    }
    expect = {}
    for u, evs in _by_user(raw).items():
        sess = seq = 0
        prev = None
        for ts, eid, _t, _v in evs:
            if prev is not None and ts - prev > gap:
                sess += 1
                seq = 0
            elif prev is not None:
                seq += 1
            expect[eid] = (u, sess, seq)
            prev = ts
    assert got == expect


@settings(max_examples=25, deadline=None)
@given(events_strategy)
def test_asof_property(ray_session, raw):
    import ray.data

    from anserini_ray.stages.temporal import asof_join

    got = {
        r["event_id"]: (r["matched_event_id"], r["lag_us"])
        for r in asof_join(
            ray.data.from_arrow(_table(raw)), "l", "r"
        ).take_all()
    }
    expect = {}
    for u, evs in _by_user(raw).items():
        for ts, eid, typ, _v in evs:
            if typ != "l":
                continue
            cands = [
                (rts, rid)
                for rts, rid, rtyp, _ in evs
                if rtyp == "r" and (rts, rid) and rts <= ts
            ]
            if cands:
                rts, rid = max(cands)  # latest ts, largest event_id at ties
                expect[eid] = (rid, ts - rts)
            else:
                expect[eid] = (-1, -1)
    assert got == expect


@settings(max_examples=25, deadline=None)
@given(events_strategy)
def test_range_count_property(ray_session, raw):
    import ray.data

    from anserini_ray.stages.temporal import range_count_join

    w = 7 * US
    got = {
        r["event_id"]: (r["n_in_window"], r["sum_value_in_window"])
        for r in range_count_join(
            ray.data.from_arrow(_table(raw)), "l", "r", w
        ).take_all()
    }
    expect = {}
    for u, evs in _by_user(raw).items():
        for ts, eid, typ, _v in evs:
            if typ != "l":
                continue
            sel = [
                v for rts, _rid, rtyp, v in evs
                if rtyp == "r" and ts - w <= rts <= ts
            ]
            expect[eid] = (len(sel), round(sum(sel), 4))
    assert got == expect


def test_hot_user_vectorized(ray_session):
    """One user owning 50K events must go through the vectorized group path
    in reasonable time and produce a linear (not quadratic) result."""
    import time

    import ray.data

    from anserini_ray.stages.temporal import range_count_join, sessionize

    n = 50_000
    t = pa.Table.from_arrays(
        [
            pa.array(range(n), type=pa.int64()),
            pa.array(np.arange(n, dtype=np.int64) * US, type=pa.timestamp("us")),
            pa.array(np.zeros(n, dtype=np.int64)),
            pa.array(["l" if i % 2 else "r" for i in range(n)]),
            pa.array(np.ones(n)),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )
    t0 = time.perf_counter()
    sess = sessionize(ray.data.from_arrow(t), 2 * US).take_all()
    rng = range_count_join(ray.data.from_arrow(t), "l", "r", 10 * US).take_all()
    assert len(sess) == n and len(rng) == n // 2
    assert time.perf_counter() - t0 < 30

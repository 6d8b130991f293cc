"""Distributed as-of join (events → most recent order per user).

The operator has no recorded driver row (it runs as a forced gate inside
the ``events_sliding`` slot), so these differentials are its hard check:
the bucketed lexsort + maximum.accumulate merge must reproduce (1) the
deterministic DuckDB twin exactly and (2) the DATE choice of DuckDB's
native ASOF JOIN (the native operator's tie choice among equal-date
orders is unspecified, so only the date is compared there).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extractors_ray.ops import events as ev

SF = "/root/testdata/sf0.001"


def _oracle(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def test_asof_join_matches_duckdb_twin(ray_session):
    eng = ev.events_asof_orders(SF).to_pandas().reset_index(drop=True)
    con = _oracle(SF)
    ora = con.sql(ev.EVENTS_ASOF_SQL).df()
    assert len(eng) > 0
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_asof_join_matches_native_asof_dates(ray_session):
    eng = ev.events_asof_orders(SF).to_pandas()
    con = _oracle(SF)
    nat = con.sql(
        """SELECT e.event_id, o.o_orderdate FROM events e
           ASOF JOIN orders o
           ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
           ORDER BY e.event_id"""
    ).df()
    m = eng.merge(nat, on="event_id", suffixes=("", "_nat"))
    assert len(m) == len(eng) == len(nat)
    assert (m["o_orderdate"] == m["o_orderdate_nat"]).all()


def test_asof_join_edge_semantics(ray_session, tmp_path):
    """Inclusive boundary, equal-date min-orderkey tie-break, and
    no-prior-order drop — on a hand-built corpus."""
    ts = pd.Timestamp("2024-06-01 12:00:00")
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [ts, ts + pd.Timedelta(hours=1), ts - pd.Timedelta(days=9)],
            "user_id": [7, 7, 7],
            "event_type": ["c"] * 3,
            "value": [1.0] * 3,
            "props": ["{}"] * 3,
        }
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    # two orders share the asof date (keys 20 and 10 → min 10); one later
    orders = pd.DataFrame(
        {
            "o_orderkey": [20, 10, 30],
            "o_custkey": [7, 7, 7],
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [1.0] * 3,
            "o_orderdate": [ts, ts, ts + pd.Timedelta(minutes=30)],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    events.to_parquet(tmp_path / "events.parquet", index=False)
    orders.to_parquet(tmp_path / "orders.parquet", index=False)

    out = ev.events_asof_orders(str(tmp_path)).to_pandas().set_index("event_id")
    # event 1: exactly AT the date (inclusive) → min orderkey 10
    assert out.loc[1, "o_orderkey"] == 10
    # event 2: the 30-min-later order wins
    assert out.loc[2, "o_orderkey"] == 30
    # event 3: before every order → dropped
    assert 3 not in out.index


def test_asof_merge_scan_property():
    """The lexsort + maximum.accumulate kernel vs a brute-force per-event
    scan, over random corpora with heavy key/time collisions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractors_ray.ops.events import asof_merge_scan

    row = st.tuples(st.integers(0, 3), st.integers(0, 10), st.integers(0, 5))

    @given(st.lists(row, max_size=40), st.lists(row, max_size=40))
    @settings(max_examples=300, deadline=None)
    def run(orders, events):
        n_o, n_e = len(orders), len(events)
        key = np.array([k for k, _, _ in orders] + [k for k, _, _ in events], dtype=np.int64)
        t_us = np.array([t for _, t, _ in orders] + [t for _, t, _ in events], dtype=np.int64)
        side = np.array([0] * n_o + [1] * n_e, dtype=np.int8)
        okey = np.array([o for _, _, o in orders] + [-1] * n_e, dtype=np.int64)
        eid = np.array([-1] * n_o + list(range(n_e)), dtype=np.int64)
        got = asof_merge_scan(key, side, t_us, okey, eid)
        got_map = {int(e): (int(k), int(ts), int(ok), int(ot))
                   for e, k, ts, ok, ot in zip(*got)}
        for i, (ek, et, _) in enumerate(events):
            cand = [(ot, ok) for ok_key, ot, ok in orders if ok_key == ek and ot <= et]
            if not cand:
                assert i not in got_map
                continue
            best_date = max(ot for ot, _ in cand)
            best_key = min(ok for ot, ok in cand if ot == best_date)
            assert got_map[i] == (ek, et, best_key, best_date), (i, events[i], orders)

    run()


def test_range_join_matches_duckdb(ray_session):
    eng = ev.events_orders_range_join(SF).to_pandas().reset_index(drop=True)
    con = _oracle(SF)
    ora = con.sql(ev.EVENTS_RANGE_JOIN_SQL).df()
    assert len(eng) > 0
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_range_join_scan_property():
    """Two-bound merge-count kernel vs a brute-force double loop, over
    random corpora with heavy collisions (both bounds inclusive)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractors_ray.ops.events import range_join_scan

    orow = st.tuples(st.integers(0, 3), st.integers(0, 12))
    erow = st.tuples(st.integers(0, 3), st.integers(0, 12))

    @given(st.lists(orow, max_size=40), st.lists(erow, max_size=30), st.integers(0, 6))
    @settings(max_examples=300, deadline=None)
    def run(orders, events, window):
        srt = sorted(range(len(orders)), key=lambda i: orders[i])
        K_o = np.array([orders[i][0] for i in srt], dtype=np.int64)
        T_o = np.array([orders[i][1] for i in srt], dtype=np.int64)
        k_e = np.array([k for k, _ in events], dtype=np.int64)
        t_e = np.array([t for _, t in events], dtype=np.int64)
        ei, oi = range_join_scan(K_o, T_o, k_e, t_e, window)
        got = sorted(zip(ei.tolist(), oi.tolist()))
        want = sorted(
            (i, j)
            for i, (ek, et) in enumerate(events)
            for j in range(len(K_o))
            if K_o[j] == ek and et - window <= T_o[j] <= et
        )
        assert got == want, (orders, events, window)

    run()

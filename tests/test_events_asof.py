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


# ---------------------------------------------------------------------------
# funnel / ordered sequence-pattern matching


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_funnel_matches_duckdb_twin(ray_session, sf):
    eng = ev.events_funnel(sf).to_pandas().reset_index(drop=True)
    con = _oracle(sf)
    ora = con.sql(ev.EVENTS_FUNNEL_SQL).df()
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)
    # the 1-day window genuinely discriminates: some but not all convert
    assert 0 < eng["n_conversions"].sum() < eng["n_purchases"].sum()


def test_funnel_scan_property():
    """funnel_scan vs a brute-force double loop, including the inclusive
    boundaries (same-instant click counts; click exactly window before
    counts) and cross-user isolation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    trig = st.tuples(st.integers(0, 4), st.integers(0, 50))
    probe = st.tuples(st.integers(0, 4), st.integers(0, 50))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(trig, max_size=30), st.lists(probe, max_size=30), st.integers(0, 10))
    def run(trigs, probes, w):
        k_c = np.array([t[0] for t in trigs], dtype=np.int64)
        t_c = np.array([t[1] for t in trigs], dtype=np.int64)
        k_p = np.array([p[0] for p in probes], dtype=np.int64)
        t_p = np.array([p[1] for p in probes], dtype=np.int64)
        got = ev.funnel_scan(k_c, t_c, k_p, t_p, w)
        want = np.array(
            [
                int(any(kc == kp and tp - w <= tc <= tp for kc, tc in zip(k_c, t_c)))
                for kp, tp in zip(k_p, t_p)
            ],
            dtype=np.int64,
        )
        assert (got == want).all()

    run()


def test_funnel_edge_semantics(ray_session, tmp_path):
    """Hand-built edges: same-instant click counts, click one microsecond
    past the window does not, other users' clicks never count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    w = ev.FUNNEL_WINDOW_US
    base = 1_700_000_000_000_000  # us
    rows = [
        # user 1: click at the exact window edge -> converts
        (1, base - w, "click"), (1, base, "purchase"),
        # user 2: click one us too early -> no conversion
        (2, base - w - 1, "click"), (2, base, "purchase"),
        # user 3: same-instant click -> converts
        (3, base, "click"), (3, base, "purchase"),
        # user 4: only another user's click in window -> no conversion
        (5, base - 10, "click"), (4, base, "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        tmp_path / "events.parquet",
    )
    out = ev.events_funnel(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[1, "n_conversions"] == 1
    assert out.loc[2, "n_conversions"] == 0
    assert out.loc[3, "n_conversions"] == 1
    assert out.loc[4, "n_conversions"] == 0


# ---------------------------------------------------------------------------
# cohort retention matrix
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_retention_matches_duckdb_twin(ray_session, sf):
    import duckdb

    got = ev.events_retention(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
        want = con.execute(ev.EVENTS_RETENTION_SQL).fetchdf()
    finally:
        con.close()
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=True, check_exact=True)
    # offset 0 rows exist for every cohort (each user is active on their
    # own first day), and offsets are non-negative
    day0 = got[got["offset_days"] == 0]
    assert set(day0["cohort_day"]) == set(got["cohort_day"])
    assert (got["offset_days"] >= 0).all()


def test_retention_bruteforce(ray_session, tmp_path):
    """Hand-built events: multi-day users, a single-day user, and
    same-day duplicate events (must not double-count)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # user 1: first day D0, active D0 (twice) and D2
        (1, "2024-01-01 08:00:00"),
        (1, "2024-01-01 23:59:59"),
        (1, "2024-01-03 00:00:00"),
        # user 2: same cohort D0, active only D0
        (2, "2024-01-01 12:00:00"),
        # user 3: cohort D1, active D1 and D2
        (3, "2024-01-02 01:00:00"),
        (3, "2024-01-03 13:00:00"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    got = ev.events_retention(str(tmp_path)).to_pandas()
    want = pd.DataFrame(
        {
            "cohort_day": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-02"]
            ).astype("datetime64[us]"),
            "offset_days": np.array([0, 2, 0, 1], dtype=np.int64),
            "users": np.array([2, 1, 1, 1], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=True, check_exact=True
    )


def test_retention_random_bruteforce(ray_session, tmp_path):
    """Randomized differential: engine == a dict-based single-process
    cohort fold over random sparse activity."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(31)
    n = 400
    users = rng.randint(0, 40, size=n)
    days = rng.randint(0, 15, size=n)
    secs = rng.randint(0, 86400, size=n)
    ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(days, unit="D") + pd.to_timedelta(
        secs, unit="s"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": users.astype(np.int64),
            "event_type": "view",
            "value": 0.0,
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    got = ev.events_retention(str(tmp_path)).to_pandas()

    ud = {}
    for u, d in zip(users, days):
        ud.setdefault(int(u), set()).add(int(d))
    want: dict[tuple, int] = {}
    for u, ds_ in ud.items():
        c = min(ds_)
        for d in ds_:
            want[(c, d - c)] = want.get((c, d - c), 0) + 1
    base = pd.Timestamp("2024-03-01")
    got_d = {
        (int((r.cohort_day - base).days), int(r.offset_days)): int(r.users)
        for r in got.itertuples()
    }
    assert got_d == want


# ---------------------------------------------------------------------------
# windowed distinct actives (WAU)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_wau_matches_duckdb_twin(ray_session, sf):
    import duckdb

    got = ev.events_wau(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
        want = con.execute(ev.EVENTS_WAU_SQL).fetchdf()
    finally:
        con.close()
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=True, check_exact=True)
    # a trailing window can only cover ≥ the single-day actives
    assert (got["active_users"] >= 1).all()


def test_wau_bruteforce_multiday_dedup(ray_session, tmp_path):
    """A user active on two days inside the same window must count ONCE
    for the window ends both days cover."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "2024-01-01 05:00:00"),
        (1, "2024-01-03 05:00:00"),  # same 7-day windows as day 1 overlap
        (2, "2024-01-01 09:00:00"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": "view",
            "value": 0.0,
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    got = ev.events_wau(str(tmp_path)).to_pandas().set_index("window_end")["active_users"]
    base = pd.Timestamp("2024-01-01")
    # windows ending Jan 1-7 cover day 1 (both users); Jan 3-9 cover day 3
    # (user 1 again — must not double count inside Jan 3-7)
    for d in range(0, 7):
        assert got[base + pd.Timedelta(days=d)] == 2
    for d in range(7, 9):
        assert got[base + pd.Timedelta(days=d)] == 1  # only user 1 via day 3
    assert len(got) == 9

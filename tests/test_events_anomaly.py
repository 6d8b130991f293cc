"""MAD anomaly flags: DuckDB parity + planted-spike detection."""

import duckdb
import numpy as np
import pytest
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractors_ray.ops import events as ev


def test_mad_matches_duckdb_twin(ray_session):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = ev.events_mad_anomaly(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        ora = con.sql(ev.EVENTS_MAD_SQL).df()
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=False)


def _write_events(tmp_path, rows):
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


def test_mad_flags_planted_spike_and_resists_poisoning(ray_session, tmp_path):
    """100 quiet hours at ~10 events, one 200-event spike: the spike is
    flagged, the quiet hours are not — and because median/MAD have a 50%
    breakdown point, adding 20 more spike hours (17% of the sample)
    still cannot drag the threshold up to mask the original spike."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(100):
        for i in range(10 + (h % 3)):  # 10-12 events/hour
            rows.append((base + dt.timedelta(hours=h, minutes=i % 60), "click"))
    for i in range(200):  # the spike hour
        rows.append((base + dt.timedelta(hours=200, minutes=i % 60), "click"))
    _write_events(tmp_path, rows)
    got = ev.events_mad_anomaly(str(tmp_path)).to_pandas()
    flagged = got[got["is_anomaly"] == 1]
    assert len(flagged) == 1 and int(flagged["cnt"].iloc[0]) == 200
    assert got["med"].iloc[0] in (10, 11, 12) and got["mad"].iloc[0] <= 2

    # poison: 20 additional spike hours — still a minority, flags survive
    for h in range(300, 320):
        for i in range(200):
            rows.append((base + dt.timedelta(hours=h, minutes=i % 60), "click"))
    _write_events(tmp_path, rows)
    got2 = ev.events_mad_anomaly(str(tmp_path)).to_pandas()
    assert (got2.loc[got2["cnt"] >= 200, "is_anomaly"] == 1).all()
    assert (got2.loc[got2["cnt"] <= 12, "is_anomaly"] == 0).all()


# ---------------------------------------------------------------------------
# CUSUM drift detection
# ---------------------------------------------------------------------------


def test_cusum_matches_duckdb_twin(ray_session):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = ev.events_cusum(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        ora = con.sql(ev.EVENTS_CUSUM_SQL).df()
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=False)


def test_cusum_catches_sustained_drift_mad_misses(ray_session, tmp_path):
    """A +4/hour level shift over the last 30 hours: no single hour is a
    6-MAD spike (MAD flags nothing in the shifted window), but the CUSUM
    accumulates and alarms — the two detectors are complementary, not
    redundant."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    for h in range(100):
        for i in range(10 + (h % 2)):  # quiet: 10-11 events/hour
            rows.append((base + dt.timedelta(hours=h, minutes=i % 60), "click"))
    for h in range(100, 130):
        for i in range(15):  # sustained small shift: 15/hour
            rows.append((base + dt.timedelta(hours=h, minutes=i % 60), "click"))
    _write_events(tmp_path, rows)
    mad = ev.events_mad_anomaly(str(tmp_path)).to_pandas()
    assert int(mad["is_anomaly"].sum()) == 0  # pointwise detector blind
    cu = ev.events_cusum(str(tmp_path)).to_pandas().sort_values("hour")
    assert int(cu["alarm"].sum()) > 0
    # alarms only inside/after the shifted window, never in the quiet prefix
    first_alarm_hour = cu.loc[cu["alarm"] == 1, "hour"].min()
    assert first_alarm_hour >= pd.Timestamp(base + dt.timedelta(hours=100))
    # twin agrees on the crafted corpus
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    ora = con.sql(ev.EVENTS_CUSUM_SQL).df().sort_values(["event_type", "hour"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        cu.sort_values(["event_type", "hour"]).reset_index(drop=True),
        ora[cu.columns],
        check_dtype=False,
    )


# --- shuffle-skew diagnostics --------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_skew_stats_matches_duckdb_twin(ray_session, sf):
    import duckdb

    from pdf_extractors_ray.ops import events as ev

    eng = ev.events_skew_stats(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ora = con.execute(ev.EVENTS_SKEW_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )


def test_skew_stats_crafted_distributions(ray_session, tmp_path):
    """Gini endpoints and the salt recommendation on crafted key loads:
    uniform → gini 0 / salt 1; one dominant key → gini near the
    closed-form and a salt factor that splits it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractors_ray.ops import events as ev

    def write(counts, path):
        uid = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        n = len(uid)
        pq.write_table(
            pa.table(
                {
                    "event_id": np.arange(n, dtype=np.int64),
                    "ts": np.full(n, np.datetime64("2024-01-01", "us")),
                    "user_id": uid,
                    "event_type": ["c"] * n,
                    "value": np.ones(n),
                    "props": ["{}"] * n,
                }
            ),
            path / "events.parquet",
        )

    d1 = tmp_path / "uni"; d1.mkdir()
    write([4] * 10, d1)
    r = ev.events_skew_stats(str(d1)).to_pandas().iloc[0]
    assert int(r["gini_ppm"]) == 0
    assert int(r["salt_factor"]) == 1
    assert int(r["p99_count"]) == 4

    d2 = tmp_path / "hot"; d2.mkdir()
    write([1] * 9 + [91], d2)  # n=10 keys, total=100, hot key 9 carries 91
    r = ev.events_skew_stats(str(d2)).to_pandas().iloc[0]
    assert int(r["top_key"]) == 9
    assert int(r["max_key_count"]) == 91
    # exact gini: x=[1]*9+[91]: S = sum i*x = 45 + 10*91 = 955
    # G_ppm = (2*955 - 11*100)*1e6 // (10*100) = 810000 // 1 → 810*1000
    assert int(r["gini_ppm"]) == (2 * 955 - 11 * 100) * 1_000_000 // (10 * 100)
    assert int(r["salt_factor"]) == (91 * 10 + 99) // 100  # = 10


# --- watermark / late-data accounting -------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_watermark_matches_duckdb_twin(ray_session, sf):
    import duckdb

    eng = ev.events_watermark_late(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ora = con.execute(ev.EVENTS_WATERMARK_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )
    # the jitter overlay must produce real late events AND on-time ones
    total, late = int(eng["n_events"].sum()), int(eng["n_late"].sum())
    assert 0 < late < total


def test_watermark_sequential_reference(ray_session):
    """Single-process sequential watermark replay == the distributed
    two-pass prefix scan (incl. the no-watermark first arrival)."""
    sf = "/root/testdata/sf0.001"
    df = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "ts"])
    eid = df["event_id"].to_numpy(np.int64)
    t_all = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ak = ev._arrival_key(eid, t_all)
    order = np.lexsort((eid, ak))
    t = t_all[order]
    run = None
    late_days = {}
    for x in t:
        day = int(x // 86_400_000_000)
        late_days.setdefault(day, [0, 0])
        late_days[day][0] += 1
        if run is not None and x < run - ev.LATE_US:
            late_days[day][1] += 1
        run = x if run is None else max(run, int(x))
    got = ev.events_watermark_late(sf).to_pandas()
    for _, row in got.iterrows():
        n, l = late_days[int(row["day"])]
        assert int(row["n_events"]) == n and int(row["n_late"]) == l, int(row["day"])
    assert got["n_events"].sum() == len(t)


# --- one-pass GROUPING SETS rollup -----------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_rollup_matches_duckdb_twin(ray_session, sf):
    import duckdb

    eng = ev.events_rollup(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ora = con.execute(ev.EVENTS_ROLLUP_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )


def test_rollup_level_consistency(ray_session):
    """Every coarser level must re-sum exactly from the finest level."""
    eng = ev.events_rollup("/root/testdata/sf0.001").to_pandas()
    fine = eng[eng["lvl"] == 3]
    for col in ("n", "cents"):
        by_type = fine.groupby("event_type")[col].sum()
        lv1 = eng[eng["lvl"] == 1].set_index("event_type")[col]
        assert (by_type.sort_index() == lv1.sort_index()).all()
        by_day = fine.groupby("day")[col].sum()
        lv2 = eng[eng["lvl"] == 2].set_index("day")[col]
        assert (by_day.sort_index() == lv2.sort_index()).all()
        assert int(eng[eng["lvl"] == 0][col].iloc[0]) == int(fine[col].sum())

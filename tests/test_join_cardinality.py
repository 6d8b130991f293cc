"""CMS join-cardinality estimation differentials: DuckDB twin at two
sfs, the upper-bound theorem under forced collisions, and exactness when
the grids are collision-free."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extractors_ray.ops import events as ev

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_join_cardinality_matches_duckdb_twin(ray_session, sf):
    eng = ev.events_join_cardinality(sf).to_pandas()
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    ora = con.execute(ev.EVENTS_JOINCARD_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )
    r = eng.iloc[0]
    assert int(r["est_pairs"]) >= int(r["true_pairs"]) > 0


def _write_pair(tmp_path, ev_users, ord_custs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(ev_users)
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": np.full(n, np.datetime64("2024-01-01", "us")),
                "user_id": np.asarray(ev_users, dtype=np.int64),
                "event_type": ["c"] * n,
                "value": np.ones(n),
                "props": ["{}"] * n,
            }
        ),
        tmp_path / "events.parquet",
    )
    m = len(ord_custs)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(m, dtype=np.int64),
                "o_custkey": np.asarray(ord_custs, dtype=np.int64),
                "o_orderstatus": ["O"] * m,
                "o_totalprice": np.ones(m),
                "o_orderdate": np.full(m, np.datetime64("2024-01-01", "us")),
                "o_orderpriority": ["1-URGENT"] * m,
            }
        ),
        tmp_path / "orders.parquet",
    )


def test_join_cardinality_exact_when_collision_free(ray_session, tmp_path):
    """Few keys → no CMS column collisions → the estimate IS the true
    cardinality (inner product degenerates to the exact sum)."""
    _write_pair(tmp_path, [1, 1, 1, 2, 3, 3], [1, 2, 2, 2, 9])
    r = ev.events_join_cardinality(str(tmp_path)).to_pandas().iloc[0]
    # true = 3*1 (k=1) + 1*3 (k=2) = 6; key 3 and 9 unmatched
    assert int(r["true_pairs"]) == 6
    assert int(r["est_pairs"]) == 6
    assert int(r["est_over_true_ppm"]) == 1_000_000


def test_join_cardinality_upper_bound_under_collisions(ray_session, tmp_path):
    """Thousands of keys in 1024 columns force collisions; the estimate
    must stay an upper bound (the in-op raise guards it too)."""
    rng = np.random.RandomState(11)
    ev_users = rng.randint(0, 5000, 8000)
    ord_custs = rng.randint(0, 5000, 6000)
    _write_pair(tmp_path, ev_users, ord_custs)
    r = ev.events_join_cardinality(str(tmp_path)).to_pandas().iloc[0]
    a = pd.Series(ev_users).value_counts()
    b = pd.Series(ord_custs).value_counts()
    true = int((a * b).dropna().sum())
    assert int(r["true_pairs"]) == true
    assert int(r["est_pairs"]) >= true
    # CMS inner-product envelope: expected excess per row ≈ N_a·N_b/w
    # (Cormode & Muthukrishnan); 3× of it is a comfortable deterministic
    # margin for the fixed md5 hashes
    budget = 3 * (len(ev_users) * len(ord_custs)) // ev.JOINCARD_W
    assert int(r["est_pairs"]) <= true + budget

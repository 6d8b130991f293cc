"""CDC merge (lakehouse MERGE/upsert) differentials.

The operator runs as a forced twin gate inside the quantiles slot
(``orders_price_quantiles``); these tests are its hard check beyond the
gate: DuckDB twin at two sfs, a hand-built edge fixture through the
GENERIC kernel, a brute-force reference over random change logs, and
the duplicate-version contract raise.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extractors_ray.ops import relational as rl

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_cdc_merge_matches_duckdb_twin(ray_session, sf):
    eng = rl.orders_cdc_merge(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    ora = con.execute(rl.ORDERS_CDC_MERGE_SQL).fetchdf()
    con.close()
    assert len(eng) > 0
    # every overlay class must be exercised (ghost/del vanish by design)
    assert {"base", "u1", "u2", "ins", "insu"} <= set(eng["src"])
    assert "del" not in set(eng["src"]) and "ghost" not in set(eng["src"])
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=True)


def test_cdc_merge_edge_fixture(ray_session):
    """Hand-built log: plain base, update chain, update-then-delete,
    insert-then-update, delete-of-absent, delete-then-reinsert."""
    import ray.data as rd

    log = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 2, 3, 3, 3, 4, 4, 5, 6, 6, 6],
            "payload": [10, 20, 21, 30, 31, 0, 40, 41, 0, 60, 0, 62],
            "version": [0, 0, 1, 0, 1, 2, 1, 2, 1, 0, 1, 2],
            "op": ["U", "U", "U", "U", "U", "D", "U", "U", "D", "U", "D", "U"],
        }
    )
    got = (
        rl.cdc_merge(rd.from_pandas(log), key="o_orderkey")
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 4, 6],
            "payload": [10, 21, 41, 62],
            "version": [0, 1, 2, 2],
        }
    )
    pd.testing.assert_frame_equal(
        got.astype({"o_orderkey": np.int64, "payload": np.int64, "version": np.int64}),
        want.astype({"o_orderkey": np.int64, "payload": np.int64, "version": np.int64}),
    )


def test_cdc_merge_random_bruteforce(ray_session):
    """Random change logs vs a pandas reference resolution."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 400
        keys = rng.randint(0, 60, n)
        # unique versions per key: rank within key of a random permutation
        perm = rng.permutation(n)
        df = pd.DataFrame({"o_orderkey": keys, "r": perm})
        df["version"] = df.groupby("o_orderkey")["r"].rank(method="first").astype(np.int64)
        df["op"] = np.where(rng.rand(n) < 0.25, "D", "U")
        df["val"] = rng.randint(0, 10**6, n).astype(np.int64)
        df = df.drop(columns=["r"])

        ref = df.sort_values(["o_orderkey", "version"]).groupby("o_orderkey").tail(1)
        ref = (
            ref[ref["op"] == "U"]
            .drop(columns=["op"])
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        got = (
            rl.cdc_merge(rd.from_pandas(df), key="o_orderkey")
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)[ref.columns.tolist()]
        )
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_cdc_merge_duplicate_version_raises(ray_session):
    import ray.data as rd

    log = pd.DataFrame(
        {
            "o_orderkey": [1, 1],
            "version": [1, 1],
            "op": ["U", "U"],
            "val": [5, 6],
        }
    )
    with pytest.raises(Exception, match="versions must be unique|duplicate"):
        rl.cdc_merge(rd.from_pandas(log), key="o_orderkey").to_pandas()


# --- snapshot diff ----------------------------------------------------------


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_snapshot_diff_matches_duckdb_twin(ray_session, sf):
    eng = rl.orders_snapshot_diff(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    ora = con.execute(rl.ORDERS_SNAPSHOT_DIFF_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )
    m = eng.set_index("change")["n_keys"]
    # the CDC overlay guarantees every class except changed_cust is hit
    for cls in ("added", "removed", "changed", "same", "changed_price"):
        assert int(m[cls]) > 0, cls
    assert int(m["changed"]) == int(m["changed_price"])  # merges never move custkey


def test_snapshot_diff_conservation(ray_session):
    """Key conservation: base keys = removed + changed + same; next keys =
    added + changed + same — cross-checked against the actual tables."""
    import pyarrow.parquet as pq

    m = rl.orders_snapshot_diff(SF).to_pandas().set_index("change")["n_keys"]
    n_base = pq.read_metadata(f"{SF}/orders.parquet").num_rows
    n_next = len(rl.orders_cdc_merge(SF).to_pandas())
    assert int(m["removed"] + m["changed"] + m["same"]) == n_base
    assert int(m["added"] + m["changed"] + m["same"]) == n_next


# --- balanced range partitioner --------------------------------------------


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_range_partition_matches_duckdb_twin(ray_session, sf):
    eng = rl.orders_range_partition(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    ora = con.execute(rl.ORDERS_RANGE_PARTITION_SQL).fetchdf()
    n = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )
    assert int(eng["n_rows"].sum()) == n  # partition cover
    # equi-depth balance on this low-tie domain: within 2% + 2 of ideal
    ideal = n / rl.RANGE_PARTS
    assert eng["n_rows"].max() <= ideal * 1.02 + 2
    assert eng["n_rows"].min() >= ideal * 0.98 - 2
    # ranges tile: consecutive hi == next lo
    assert (eng["hi_cents"].to_numpy()[:-1] == eng["lo_cents"].to_numpy()[1:]).all()


def test_range_partition_tied_domain(ray_session, tmp_path):
    """A heavily tied column: all ties of a boundary value land in ONE
    range (documented semantics) — counts still cover, twin still exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 1000
    price = np.where(np.arange(n) % 2 == 0, 5.0, 7.0)  # two distinct values
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_custkey": np.zeros(n, dtype=np.int64),
                "o_orderstatus": ["O"] * n,
                "o_totalprice": price,
                "o_orderdate": np.full(n, np.datetime64("2024-01-01", "us")),
                "o_orderpriority": ["1-URGENT"] * n,
            }
        ),
        tmp_path / "orders.parquet",
    )
    eng = rl.orders_range_partition(str(tmp_path)).to_pandas()
    assert int(eng["n_rows"].sum()) == n
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
    )
    ora = con.execute(rl.ORDERS_RANGE_PARTITION_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )


# --- duplicate-payment detection --------------------------------------------


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_dup_payments_matches_duckdb_twin(ray_session, sf):
    eng = rl.orders_duplicate_payments(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    ora = con.execute(rl.ORDERS_DUP_PAY_SQL).fetchdf()
    con.close()
    assert len(eng) > 0
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True), check_dtype=True
    )
    # overlay guarantees zero-gap clones exist (offset k%10 == 0)
    assert (eng["min_gap_days"] == 0).any()


def test_dup_payments_window_boundary(ray_session, tmp_path):
    """Hand-built payments: exactly-7-days qualifies, 8 days does not;
    different amounts never pair; three same-amount payments in-window
    yield C(3,2)=3 pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d0 = np.datetime64("2024-01-01", "us")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    # keys chosen with k % 19 != 4 so the overlay adds no clones here
    rows = [
        (1, 7, 100.0, d0),            # trio A
        (2, 7, 100.0, d0 + 3 * day),  # trio A
        (3, 7, 100.0, d0 + 6 * day),  # trio A → 3 pairs
        (5, 8, 50.0, d0),             # boundary pair: exactly 7 days
        (6, 8, 50.0, d0 + 7 * day),
        (7, 9, 60.0, d0),             # 8 days → no pair
        (8, 9, 60.0, d0 + 8 * day),
        (9, 10, 70.0, d0),            # different amounts → no pair
        (10, 10, 71.0, d0),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.array([r[0] for r in rows], np.int64),
                "o_custkey": np.array([r[1] for r in rows], np.int64),
                "o_orderstatus": ["O"] * len(rows),
                "o_totalprice": np.array([r[2] for r in rows]),
                "o_orderdate": np.array([r[3] for r in rows]),
                "o_orderpriority": ["1-URGENT"] * len(rows),
            }
        ),
        tmp_path / "orders.parquet",
    )
    out = rl.orders_duplicate_payments(str(tmp_path)).to_pandas().set_index("o_custkey")
    assert int(out.loc[7, "n_dup_pairs"]) == 3
    assert int(out.loc[7, "min_gap_days"]) == 3
    assert int(out.loc[8, "n_dup_pairs"]) == 1
    assert int(out.loc[8, "min_gap_days"]) == 7
    assert 9 not in out.index and 10 not in out.index

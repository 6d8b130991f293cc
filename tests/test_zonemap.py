"""Zone-map data-skipping differentials.

Runs as a forced twin gate in the q22 slot; hard checks here: DuckDB twin
at two sfs, the pruning-actually-happened invariants, and a crafted
clustered-date corpus where the DATE probe also prunes (proving the
decision is computed from the stats, not hardwired to the probe column).
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
def test_zonemap_matches_duckdb_twin(ray_session, sf):
    eng = rl.orders_zonemap_scan(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
    )
    ora = con.execute(rl.ORDERS_ZONEMAP_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=True)
    kp = eng[eng["probe"] == "key_range"].iloc[0]
    # the clustered probe must genuinely skip partitions
    assert kp["parts_scanned"] < kp["parts_total"]
    assert kp["rows_out"] > 0


def test_zonemap_prunes_clustered_dates(ray_session, tmp_path):
    """Keys AND dates both monotone → the date probe's zone maps skip
    most partitions too; results still exact vs a direct filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 4096
    keys = np.arange(n, dtype=np.int64)
    # one day per 4 keys starting 1995: 1997 occupies a narrow key band
    dates = np.datetime64("1995-01-01") + (keys // 4).astype("timedelta64[D]")
    price = (keys % 997).astype(np.float64) + 0.25
    pq.write_table(
        pa.table(
            {
                "o_orderkey": keys,
                "o_custkey": keys % 50,
                "o_orderstatus": ["O"] * n,
                "o_totalprice": price,
                "o_orderdate": dates.astype("datetime64[us]"),
                "o_orderpriority": ["1-URGENT"] * n,
            }
        ),
        tmp_path / "orders.parquet",
    )
    eng = rl.orders_zonemap_scan(str(tmp_path)).to_pandas()
    dp = eng[eng["probe"] == "date_1997"].iloc[0]
    assert dp["parts_scanned"] < dp["parts_total"]
    # exactness vs a direct pandas filter
    df = pd.DataFrame({"k": keys, "d": dates, "p": price})
    want = df[(df["d"] >= np.datetime64("1997-01-01")) & (df["d"] < np.datetime64("1998-01-01"))]
    assert int(dp["rows_out"]) == len(want)
    assert int(dp["revenue_cents"]) == int(np.floor(want["p"].to_numpy() * 100 + 0.5).sum())
    kp = eng[eng["probe"] == "key_range"].iloc[0]
    lo, hi = (n - 1) // 4, (n - 1) // 2
    wantk = df[(df["k"] >= lo) & (df["k"] <= hi)]
    assert int(kp["rows_out"]) == len(wantk)
    assert int(kp["revenue_cents"]) == int(np.floor(wantk["p"].to_numpy() * 100 + 0.5).sum())

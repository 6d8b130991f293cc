"""Rendezvous-hash shard placement differentials: DuckDB twin at two
sfs, the HRW minimal-movement theorem (dropping a node relocates ONLY
its own keys), balance envelope, and determinism."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extractors_ray.ops import curate as cu

SF = "/root/testdata/sf0.001"


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_shard_assign_matches_duckdb_twin(ray_session, sf):
    eng = cu.docs_shard_assign(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(cu.DOCS_SHARD_ASSIGN_SQL).fetchdf()
    con.close()
    assert len(eng) == cu.HRW_NODES  # every node holds something at these sfs
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=True)


def test_hrw_minimal_movement():
    """HRW's defining property, exactly: removing node d reassigns the
    keys that WERE on d and no others."""
    ids = np.arange(2000, dtype=np.int64)
    full = cu.hrw_assign(ids)
    for d in (0, 7, 15):
        dropped = cu.hrw_assign(ids, drop_node=d)
        stayed = full != d
        assert (dropped[stayed] == full[stayed]).all()
        assert (dropped[~stayed] != d).all()
        assert (~stayed).sum() > 0


def test_hrw_balance_and_determinism():
    ids = np.arange(16000, dtype=np.int64)
    a = cu.hrw_assign(ids)
    b = cu.hrw_assign(ids[::-1])[::-1]
    assert (a == b).all()
    counts = np.bincount(a, minlength=cu.HRW_NODES)
    # binomial(16000, 1/16): mean 1000, sd ~30.6; 5 sigma envelope
    assert counts.min() > 1000 - 5 * 31 and counts.max() < 1000 + 5 * 31

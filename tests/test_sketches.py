"""KMV distinct-count sketch: DuckDB bit-parity + mergeability."""

import duckdb
import numpy as np
import pandas as pd

from pdf_extractors_ray.ops import events as ev


def test_kmv_matches_duckdb_twin(ray_session):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = ev.events_kmv_distinct(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        ora = con.sql(ev.EVENTS_KMV_SQL).df()
        pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_kmv_merge_property():
    """Per-block k-smallest-distinct partials must merge to the global
    k smallest distinct — the invariant the distributed shape relies on —
    and the estimate must be the closed form of the k-th minimum."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    k = 8

    @given(
        st.lists(st.integers(0, 500), min_size=1, max_size=120),
        st.integers(1, 6),
        st.randoms(use_true_random=False),
    )
    @settings(max_examples=200, deadline=None)
    def run(values, n_blocks, rng):
        vals = np.array(values, dtype=np.int64)
        idx = np.arange(len(vals))
        rng.shuffle(idx)
        blocks = np.array_split(vals[idx], n_blocks)
        partials = [
            np.unique(ev._kmv_hash(np.unique(b)))[:k] for b in blocks if len(b)
        ]
        merged = np.unique(np.concatenate(partials))[:k]
        global_h = np.unique(ev._kmv_hash(np.unique(vals)))[:k]
        assert (merged == global_h).all()
        n_kept, kth, est = ev.kmv_estimate(merged, k)
        n_distinct = len(np.unique(vals))
        if n_distinct < k:
            assert (n_kept, est) == (n_distinct, n_distinct)
        else:
            assert n_kept == k and kth == int(global_h[k - 1])
            assert est == int(np.floor((k - 1) * float(1 << 60) / float(kth)))

    run()


def test_kmv_estimate_accuracy():
    """Statistical sanity at a size where the sketch path engages: the
    k=128 estimate of 5,000 distinct values lands within 4 sigma."""
    vals = np.arange(5000, dtype=np.int64)
    h = np.unique(ev._kmv_hash(vals))[: ev.KMV_K]
    _, _, est = ev.kmv_estimate(h)
    sigma = 5000 / np.sqrt(ev.KMV_K - 2)
    assert abs(est - 5000) < 4 * sigma

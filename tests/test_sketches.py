"""KMV distinct-count sketch: DuckDB bit-parity + mergeability."""

import duckdb
import numpy as np
import pandas as pd
import pytest

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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_mg_bound_property():
    """Simulated distributed MG (per-chunk exact counts -> compress ->
    global sum) satisfies the mergeable-summaries theorem on random
    streams: estimates never over-count, under-count by at most
    n/(m+1), and every token heavier than the bound is present."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractors_ray.ops.text import mg_compress

    m = 8

    @given(
        st.lists(st.integers(0, 30), min_size=1, max_size=400),
        st.integers(1, 7),
    )
    @settings(max_examples=200, deadline=None)
    def run(vals, n_chunks):
        toks = [f"t{v}" for v in vals]
        chunks = np.array_split(np.array(toks, dtype=object), n_chunks)
        merged = Counter()
        for ch in chunks:
            if len(ch) == 0:
                continue
            comp = mg_compress(pd.Series(Counter(ch)).astype(np.int64), m)
            merged.update(comp.to_dict())
        true = Counter(toks)
        n = len(toks)
        bound = n // (m + 1)
        for tok, est in merged.items():
            assert est <= true[tok] <= est + bound, (tok, est, true[tok], bound)
        for tok, c in true.items():
            if c > bound:
                assert tok in merged, (tok, c, bound)

    run()


def test_mg_heavy_hitters_vs_exact(ray_session):
    """Distributed sketch over the real corpus vs a single-process exact
    count: bound + containment for the exact top-k."""
    from collections import Counter

    from pdf_extractors_ray.ops.text import MG_CAPACITY, mg_heavy_hitters

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(f"SELECT text FROM '{sf}/documents.parquet'").df()
    true = Counter(t for txt in docs["text"] for t in txt.split(" "))
    n_total, cand = mg_heavy_hitters(sf)
    assert n_total == sum(true.values())
    bound = n_total // (MG_CAPACITY + 1)
    est = dict(zip(cand["token"], cand["est"]))
    for tok, e in est.items():
        assert e <= true[tok] <= e + bound
    for tok, c in true.most_common(25):
        if c > bound:
            assert tok in est


# ---------------------------------------------------------------------------
# exact distributed quantile selection
# ---------------------------------------------------------------------------


def test_quantiles_match_duckdb_twin(ray_session):
    from pdf_extractors_ray.ops import relational as rel

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = rel.orders_price_quantiles(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
        ora = con.sql(rel.ORDERS_QUANTILES_SQL).df()
        eng["q_ppm"] = eng["q_ppm"].astype(np.int64)
        ora["q_ppm"] = ora["q_ppm"].astype(np.int64)
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_quantile_selection_vs_numpy(ray_session):
    """Histogram-narrowing selection == sorted k-th element on adversarial
    distributions: heavy ties, skew, tiny n, single distinct value,
    negative values."""
    import ray.data as rd

    from pdf_extractors_ray.ops.relational import exact_quantiles_int

    rng = np.random.RandomState(7)
    cases = [
        rng.randint(0, 10, size=1000),              # heavy ties
        rng.randint(-50_000, 50_000, size=5000),    # wide + negatives
        np.full(37, 42),                            # single distinct value
        np.array([5]),                              # n = 1
        (rng.pareto(1.2, size=3000) * 1e6).astype(np.int64),  # skew
    ]
    qs = (1, 250_000, 500_000, 900_000, 999_999, 1_000_000)
    for vals in cases:
        ds = rd.from_pandas(pd.DataFrame({"c": vals.astype(np.int64)}))
        n, rows = exact_quantiles_int(ds, "c", qs_ppm=qs, n_bins=16)
        assert n == len(vals)
        srt = np.sort(vals)
        for q, rank, val in rows:
            k = int(np.ceil(q / 1_000_000.0 * n))
            assert rank == k
            assert val == srt[k - 1], (q, k, val, srt[k - 1])


def test_q22_antijoin_matches_duckdb_twin(ray_session):
    from pdf_extractors_ray.ops import relational as rl

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = rl.q22_antijoin_nation(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        for t in ("customer", "orders"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        want = con.sql(rl.Q22_SQL).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
        assert got["numcust"].sum() > 0  # the anti join must be selective, not empty


def test_q22_antijoin_semantics_bruteforce(ray_session):
    """Reference semantics recomputed in pandas: above-average positive
    balance (integer cross-multiplied) and no urgent order."""
    sf = "/root/testdata/sf0.001"
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    bal = np.floor(cust["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
    pos = bal[cust["c_acctbal"].to_numpy() > 0]
    s, n = pos.sum(), len(pos)
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_custkey"])
    keep = (bal * n > s) & ~cust["c_custkey"].isin(urgent).to_numpy()
    want = (
        pd.DataFrame({"c_nationkey": cust["c_nationkey"].to_numpy(np.int64)[keep],
                      "bal": bal[keep]})
        .groupby("c_nationkey")
        .agg(numcust=("bal", "size"), totacctbal_cents=("bal", "sum"))
        .reset_index()
    )
    from pdf_extractors_ray.ops import relational as rl

    got = rl.q22_antijoin_nation(sf).to_pandas()
    assert got["c_nationkey"].tolist() == want["c_nationkey"].tolist()
    assert got["numcust"].tolist() == want["numcust"].tolist()
    assert got["totacctbal_cents"].tolist() == want["totacctbal_cents"].tolist()


# ---------------------------------------------------------------------------
# bloom-filter semi-join
# ---------------------------------------------------------------------------


def _bloom_oracle(sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    return con.sql(ev.EVENTS_BLOOM_SQL).df()


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_bloom_semijoin_matches_duckdb_twin(ray_session, sf):
    eng = ev.events_bloom_semijoin(sf).to_pandas().reset_index(drop=True)
    ora = _bloom_oracle(sf)
    pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=True)


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    sf = "/root/testdata/sf0.01"
    eng = ev.events_bloom_semijoin(sf).to_pandas()
    truth = duckdb.sql(
        f"""SELECT DISTINCT user_id FROM '{sf}/events.parquet'
            WHERE user_id IN (SELECT o_custkey FROM '{sf}/orders.parquet'
                              WHERE o_orderpriority = '1-URGENT')"""
    ).df()["user_id"]
    members = set(truth.to_numpy())
    hits = set(eng.loc[eng["bloom_hit"] == 1, "user_id"].to_numpy())
    assert members <= hits  # a bloom filter NEVER drops a true member
    # FP count bounded: at 8 bits/key, k=4 the theoretical rate is ~2.4%;
    # allow a generous envelope over the non-member population
    n_non = len(eng) - len(members)
    assert len(hits - members) <= max(3, int(0.1 * n_non))


def test_bloom_forced_false_positives(ray_session, monkeypatch):
    """With m clamped to 64 bits the filter must saturate: every probe
    key collides into set bits — exercising the FP path end to end
    (the twin stays in lockstep because m derives identically)."""
    monkeypatch.setattr(ev, "_bloom_m", lambda n: 64)
    eng = ev.events_bloom_semijoin("/root/testdata/sf0.001").to_pandas()
    # ~1300 build keys × 4 hashes over 64 bits ⇒ all bits set ⇒ all hit
    assert (eng["bloom_hit"] == 1).all()


def test_bloom_tree_or_equals_single_pass():
    """Tree-OR of per-chunk bitmaps == bitmap of the concatenation."""
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 10_000, size=500).astype(np.int64)
    m = 2048

    def bitmap(ks: np.ndarray) -> np.ndarray:
        bm = np.zeros(m // 64, dtype=np.uint64)
        for i in range(ev.BLOOM_K):
            p = ev._bloom_positions(ks, i, m)
            np.bitwise_or.at(bm, p // 64, np.uint64(1) << (p % 64).astype(np.uint64))
        return bm

    chunks = np.array_split(keys, 7)
    acc = np.zeros(m // 64, dtype=np.uint64)
    for c in chunks:
        acc = np.bitwise_or(acc, bitmap(c))
    assert (acc == bitmap(keys)).all()


def test_bloom_empty_build_side(ray_session):
    """No build keys at all → zero bitmap → every probe misses."""
    eng = ev.events_bloom_semijoin("/root/testdata/sf0.001", priority="no-such").to_pandas()
    assert len(eng) > 0 and (eng["bloom_hit"] == 0).all()


# ---------------------------------------------------------------------------
# mergeable ε-approximate quantile sketch
# ---------------------------------------------------------------------------


def test_block_rank_summary_theorem_bound():
    """Kernel property: for ANY block and any rank k, the summary's
    weighted-rank estimate is within ε·m of the truth. Adversarial
    shapes: ties, skew, tiny blocks."""
    from pdf_extractors_ray.ops.relational import SKETCH_EPS_PPM, block_rank_summary

    rng = np.random.RandomState(5)
    blocks = [
        np.array([7], dtype=np.int64),
        np.array([3, 3, 3, 3], dtype=np.int64),
        rng.randint(0, 50, size=1000).astype(np.int64),  # heavy ties
        (rng.pareto(1.1, size=5000) * 1e6).astype(np.int64),  # skew
    ]
    for v in blocks:
        vals, wts = block_rank_summary(v)
        assert wts.sum() == len(v)
        assert vals[-1] == v.max()
        sv = np.sort(v)
        cum = np.cumsum(wts)
        eps_m = (SKETCH_EPS_PPM * len(v)) // 1_000_000 + 1
        for k in [1, len(v) // 2, len(v)]:
            est = vals[int(np.searchsorted(cum, k))]
            # the estimate's true rank window must contain a rank within ε·m of k
            lo = int(np.searchsorted(sv, est, side="left"))
            hi = int(np.searchsorted(sv, est, side="right"))
            assert lo - eps_m <= k - 1 <= hi - 1 + eps_m, (len(v), k, est)


def test_quantile_sketch_within_budget_vs_exact(ray_session):
    """End-to-end: every sketch estimate's strict-below rank sits within
    the 2ε·n budget of the exact selection's rank, at two sfs."""
    from pdf_extractors_ray.ops import relational as rl

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        exact = rl.orders_price_quantiles(sf).to_pandas().set_index("q_ppm")
        sketch = rl.orders_quantile_sketch(sf)
        for r in sketch.itertuples():
            k = int(exact.loc[int(r.q_ppm), "rank"])
            below = rl.count_below(sf, int(r.value_cents))
            assert abs(below - (k - 1)) <= int(r.max_rank_err), (sf, int(r.q_ppm))


def test_quantile_sketch_mergeable(ray_session):
    """Summaries built from different partitionings of the same data
    estimate within budget of each other (mergeability in practice)."""
    from pdf_extractors_ray.ops.relational import (
        block_rank_summary,
        sketch_quantile_estimates,
    )

    rng = np.random.RandomState(9)
    data = (rng.pareto(1.3, size=20000) * 1e4).astype(np.int64)
    ests = []
    for n_blocks in (1, 7, 64):
        chunks = np.array_split(data, n_blocks)
        vs, ws = zip(*(block_rank_summary(c) for c in chunks))
        est = sketch_quantile_estimates(
            np.concatenate(vs), np.concatenate(ws), len(data), (500_000, 990_000)
        )
        ests.append(est)
    sv = np.sort(data)
    for est in ests:
        for q, val in est.items():
            k = int(np.ceil(q / 1e6 * len(data)))
            lo = int(np.searchsorted(sv, val, side="left"))
            hi = int(np.searchsorted(sv, val, side="right"))
            budget = 2 * (10_000 * len(data)) // 1_000_000
            assert lo - budget <= k - 1 <= hi - 1 + budget


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------


def test_hll_matches_duckdb_twin(ray_session):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = ev.events_hll_distinct(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        ora = con.sql(ev.EVENTS_HLL_SQL).df()
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=False)


def test_hll_merge_property():
    """Register-wise MAX over ANY partitioning equals the single-pass
    registers — the idempotent-merge invariant the distributed shape
    (and lineage replay) relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(st.integers(0, 2000), min_size=1, max_size=300),
        st.integers(1, 6),
        st.randoms(use_true_random=False),
    )
    @settings(max_examples=100, deadline=None)
    def run(values, n_blocks, rng):
        vals = np.array(values, dtype=np.int64)
        idx = np.arange(len(vals))
        rng.shuffle(idx)
        merged: dict[int, int] = {}
        for b in np.array_split(vals[idx], n_blocks):
            if len(b) == 0:
                continue
            part = ev.hll_partial(pd.DataFrame({"user_id": b}))
            for r, m in zip(part["register"], part["max_rho"]):
                merged[int(r)] = max(merged.get(int(r), 0), int(m))
        single = ev.hll_partial(pd.DataFrame({"user_id": vals}))
        want = dict(zip(single["register"].astype(int), single["max_rho"].astype(int)))
        assert merged == want
        # duplicated input must not move the sketch (insertion idempotence)
        doubled = ev.hll_partial(pd.DataFrame({"user_id": np.concatenate([vals, vals])}))
        got2 = dict(zip(doubled["register"].astype(int), doubled["max_rho"].astype(int)))
        assert got2 == want

    run()


def test_hll_estimate_accuracy():
    """Raw-branch accuracy: 50k distinct values estimated within 4 sigma
    (sigma = 1.04/sqrt(m)); and the small-range branch is exact-ish:
    every cardinality below ~m/4 with distinct registers returns linear
    counting, which is near-exact there."""
    part = ev.hll_partial(pd.DataFrame({"user_id": np.arange(50_000, dtype=np.int64)}))
    merged = dict(zip(part["register"].astype(int), part["max_rho"].astype(int)))
    _, _, est = ev.hll_estimate(merged)
    sigma = 1.04 / np.sqrt(ev.HLL_M) * 50_000
    assert abs(est - 50_000) < 4 * sigma, est
    # linear-counting branch engages at tiny cardinality and is close
    small = ev.hll_partial(pd.DataFrame({"user_id": np.arange(20, dtype=np.int64)}))
    sm = dict(zip(small["register"].astype(int), small["max_rho"].astype(int)))
    v, _, est_small = ev.hll_estimate(sm)
    assert v <= 20 and abs(est_small - 20) <= 2


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_matches_duckdb_twin(ray_session):
    from pdf_extractors_ray.ops import text as tx

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = tx.docs_cms_topk(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        ora = con.sql(tx.DOCS_CMS_SQL).df()
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=False)
        assert (eng["cms_est"] >= eng["n"]).all()


def test_cms_theorem_bound_under_forced_collisions():
    """With w clamped to 4 columns every cell collides heavily; the CMS
    guarantees must still hold on random streams: est ≥ true for every
    token, and est ≤ true + (N - true) (total colliding mass). Also the
    mergeable-grid invariant: partials over any split sum to the
    single-pass grid."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractors_ray.ops import text as tx

    @given(
        st.lists(st.integers(0, 40), min_size=1, max_size=300),
        st.integers(1, 5),
    )
    @settings(max_examples=100, deadline=None)
    def run(vals, n_blocks):
        from collections import Counter

        import unittest.mock as mock

        toks = [f"t{v}" for v in vals]
        true = Counter(toks)
        with mock.patch.object(tx, "CMS_W", 4):
            def grid_of(counter):
                df = pd.DataFrame(
                    {"token": list(counter), "n": list(counter.values())}
                ).astype({"n": np.int64})
                g = tx.cms_grid_partial(df)
                return {(int(r), int(c)): int(v)
                        for r, c, v in zip(g["row_i"], g["col"], g["cnt"])}

            merged: dict = {}
            for ch in np.array_split(np.array(toks, dtype=object), n_blocks):
                if len(ch) == 0:
                    continue
                for k, v in grid_of(Counter(ch)).items():
                    merged[k] = merged.get(k, 0) + v
            assert merged == grid_of(true)

            n_total = len(toks)
            for tok, cnt in true.items():
                cols = [int(tx._md5_hash15_str([tok], f"cms{i}:")[0]) % tx.CMS_W
                        for i in range(tx.CMS_D)]
                est = min(merged.get((i, c), 0) for i, c in zip(range(tx.CMS_D), cols))
                assert cnt <= est <= cnt + (n_total - cnt), (tok, cnt, est)

    run()


def test_hll_by_type_matches_duckdb_twin_and_accuracy(ray_session):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eng = ev.events_hll_by_type(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        ora = con.sql(ev.EVENTS_HLL_BY_TYPE_SQL).df()
        pd.testing.assert_frame_equal(eng, ora[eng.columns], check_dtype=False)
        exact = con.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY 1 ORDER BY 1"
        ).df()
        merged = eng.merge(exact, on="event_type")
        # every type's estimate within the HLL envelope (4 sigma, floor 3)
        sigma = 1.04 / np.sqrt(ev.HLL_M)
        err_ok = (merged["estimate"] - merged["n"]).abs() <= np.maximum(
            4 * sigma * merged["n"], 3
        )
        assert err_ok.all(), merged

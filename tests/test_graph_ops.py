"""Distributed PageRank over the doc_id link overlay (ops/graph.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extractors_ray.ops import graph
from pdf_extractors_ray.ops import graph as gr

SF = "/root/testdata/sf0.001"


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
        )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_pagerank_matches_duckdb_twin(ray_session, sf):
    got = graph.docs_pagerank(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, graph.DOCS_PAGERANK_SQL)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=True, check_exact=True)
    # the overlay is deliberately non-regular: ranks must actually vary
    assert got["rank_scaled"].nunique() > len(got) // 10
    assert (got["rank_scaled"] > 0).all()


def _ref_pagerank(doc_ids: list[int], iters: int = graph.PR_ITERS) -> dict[int, int]:
    """Single-process integer reference (python ints, no numpy)."""
    n = len(doc_ids)
    n_max = max(doc_ids) + 1
    nodes = set(doc_ids)
    ranks = {u: graph.PR_SCALE // n for u in doc_ids}
    base = ((100 - graph.PR_DAMP_PCT) * (graph.PR_SCALE // n)) // 100
    for _ in range(iters):
        contrib: dict[int, int] = {}
        for u in doc_ids:
            c = ranks[u] // graph.N_EDGES
            for rule in graph._EDGE_PY:
                v = int(rule(u, n_max))
                if v in nodes:  # mass to non-existent ids is dropped
                    contrib[v] = contrib.get(v, 0) + c
        ranks = {
            v: base + (graph.PR_DAMP_PCT * contrib.get(v, 0)) // 100 for v in doc_ids
        }
    return ranks


def test_pagerank_bruteforce_nondense_ids(ray_session, tmp_path):
    """Non-dense doc_ids: some overlay edges target ids that do not exist
    — both the engine and the reference must drop that mass."""
    doc_ids = [3, 10, 11, 25, 31, 58, 59, 100, 101, 999]
    df = pd.DataFrame(
        {
            "doc_id": np.array(doc_ids, dtype=np.int64),
            "text": [f"body {i}" for i in doc_ids],
            "lang": "en",
            "source": "s0",
            "n_chars": np.int64(6),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = graph.docs_pagerank(str(tmp_path)).to_pandas()
    want = _ref_pagerank(doc_ids)
    assert {int(r.doc_id): int(r.rank_scaled) for r in got.itertuples()} == want
    # the dropped-mass path was actually exercised: at least one edge of
    # the overlay points outside the id set
    n_max = max(doc_ids) + 1
    outside = sum(
        1 for u in doc_ids for rule in graph._EDGE_PY if int(rule(u, n_max)) not in set(doc_ids)
    )
    assert outside > 0
    # and the SQL twin agrees on the same fixture
    want_sql = _oracle(str(tmp_path), graph.DOCS_PAGERANK_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want_sql[got.columns], check_dtype=True, check_exact=True
    )


def test_pagerank_batch_invariant(ray_session, tmp_path):
    """Result is independent of input block layout (the bucketed combine
    is associative in int64)."""
    import ray.data as rd

    n = 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64) * 3,  # non-dense
            "text": "t",
            "lang": "en",
            "source": "s0",
            "n_chars": np.int64(1),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    a = graph.docs_pagerank(str(tmp_path)).to_pandas()

    # same computation over a deliberately fragmented layout
    pq.write_table(
        pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"), row_group_size=7
    )
    b = graph.docs_pagerank(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
    assert rd is not None


# ---------------------------------------------------------------------------
# directed triangle counting
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_triangles_match_duckdb_twin(ray_session, sf):
    got = graph.docs_graph_triangles(sf).to_pandas().reset_index(drop=True)
    want = _oracle(sf, graph.DOCS_TRIANGLES_SQL)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=True, check_exact=True)
    # every node appears exactly once, and real cycles exist
    assert len(got) == len(got["doc_id"].unique())
    assert got["n_cycles3"].sum() > 0
    assert got["n_cycles3"].sum() % 3 == 0  # 3 corners per rotation


def _ref_triangles(doc_ids: list[int]) -> dict[int, int]:
    """Brute-force reference over the same overlay derivation."""
    n_max = max(doc_ids) + 1
    nodes = set(doc_ids)
    adj: dict[int, set] = {u: set() for u in doc_ids}
    for u in doc_ids:
        for rule in graph._EDGE_PY:
            v = int(rule(u, n_max))
            if v != u and v in nodes:
                adj[u].add(v)
    counts = {u: 0 for u in doc_ids}
    for u in doc_ids:
        for v in adj[u]:
            for w in adj[v]:
                if u in adj[w]:
                    counts[u] += 1
                    counts[v] += 1
                    counts[w] += 1
    # rotation semantics (matches the op): every starting corner
    # enumerates the cycle once, so each corner ends at 3 × cycles
    return counts


def test_triangles_bruteforce_nondense(ray_session, tmp_path):
    """Non-dense ids (dangling targets dropped) against a brute-force
    adjacency walk."""
    doc_ids = sorted(set(list(range(0, 60)) + [149, 150, 298, 500, 999]))
    df = pd.DataFrame(
        {
            "doc_id": np.array(doc_ids, dtype=np.int64),
            "text": "t",
            "lang": "en",
            "source": "s0",
            "n_chars": np.int64(1),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = graph.docs_graph_triangles(str(tmp_path)).to_pandas()
    want = _ref_triangles(doc_ids)
    assert {int(r.doc_id): int(r.n_cycles3) for r in got.itertuples()} == want
    # and the SQL twin agrees on the same fixture
    want_sql = _oracle(str(tmp_path), graph.DOCS_TRIANGLES_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want_sql[got.columns], check_dtype=True, check_exact=True
    )


# --- label propagation --------------------------------------------------


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_label_prop_matches_duckdb_twin(ray_session, sf):
    import duckdb

    eng = gr.docs_label_prop(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(gr.DOCS_LABEL_PROP_SQL).fetchdf()
    con.close()
    g = eng.sort_values("doc_id").reset_index(drop=True)
    w = ora.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=True)
    # propagation must be real: new labels in every round at these sfs
    rounds = set(g["rnd"])
    assert {0, 1, 2, 3} <= rounds


def _lp_reference(doc_ids, sources, n_max, iters):
    """Pure-python synchronous clamped majority propagation."""
    label = {
        int(d): (s if d % gr.LP_SEED_MOD == 0 else "")
        for d, s in zip(doc_ids, sources)
    }
    rnd = {int(d): (0 if d % gr.LP_SEED_MOD == 0 else -1) for d in doc_ids}
    nodes = set(label)
    for k in range(1, iters + 1):
        msgs = {}
        for u, lab in label.items():
            if lab == "":
                continue
            for rule in gr._EDGE_PY:
                v = int(rule(np.array([u]), n_max)[0])
                if v in nodes and label[v] == "":
                    msgs.setdefault(v, []).append(lab)
        new = {}
        for v, labs in msgs.items():
            cnt = {}
            for l in labs:
                cnt[l] = cnt.get(l, 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        for v, lab in new.items():
            label[v] = lab
            rnd[v] = k
    return label, rnd


def test_label_prop_bruteforce_nondense_ids(ray_session, tmp_path):
    """Non-dense doc_ids: overlay targets that hit holes are dropped by
    both engines; engine matches a pure-python synchronous reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    ids = np.unique(rng.randint(0, 4000, 300)).astype(np.int64)
    src = np.array([f"s{int(i) % 4}" for i in ids], dtype=object)
    pq.write_table(
        pa.table(
            {
                "doc_id": ids,
                "text": ["x"] * len(ids),
                "lang": ["en"] * len(ids),
                "source": src,
                "n_chars": [1] * len(ids),
            }
        ),
        tmp_path / "documents.parquet",
    )
    eng = gr.docs_label_prop(str(tmp_path)).to_pandas().sort_values("doc_id")
    n_max = int(ids.max()) + 1
    label, rnd = _lp_reference(ids, src, n_max, gr.LP_ITERS)
    assert list(eng["doc_id"]) == sorted(label)
    for _, row in eng.iterrows():
        assert row["label"] == label[int(row["doc_id"])], int(row["doc_id"])
        assert int(row["rnd"]) == rnd[int(row["doc_id"])], int(row["doc_id"])


def test_label_prop_clamping_monotone(ray_session):
    """Once labeled, never relabeled: running k and k+1 iterations agrees
    on every node labeled by round k."""
    a = gr.docs_label_prop(SF, iters=2).to_pandas().set_index("doc_id")
    b = gr.docs_label_prop(SF, iters=3).to_pandas().set_index("doc_id")
    done = a[a["rnd"] >= 0]
    sub = b.loc[done.index]
    assert (sub["label"] == done["label"]).all()
    assert (sub["rnd"] == done["rnd"]).all()
    # coverage monotone
    assert (b["rnd"] >= 0).sum() >= (a["rnd"] >= 0).sum()

"""Hashing-trick featurizer differentials.

Runs as a forced twin gate in the PMI slot; hard checks here: DuckDB twin
at two sfs, a brute-force per-token reference, and the signed-hashing
theorem — inner products unbiased under collision noise (salt-averaged).
"""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extractors_ray.ops import text as tx

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_feature_hash_matches_duckdb_twin(ray_session, sf):
    eng = tx.docs_feature_hash(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(tx.DOCS_FEATURE_HASH_SQL).fetchdf()
    con.close()
    assert len(eng) > 0
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=True)


def _brute(texts: dict[int, str], n_dims: int, salt: str = "") -> dict:
    vec = {}
    for d, text in texts.items():
        v = np.zeros(n_dims, dtype=np.int64)
        for t in text.split(" "):
            h = int(hashlib.md5((salt + t).encode()).hexdigest()[:15], 16)
            v[h % n_dims] += 1 if (h // n_dims) % 2 == 0 else -1
        vec[d] = v
    return vec


def test_feature_hash_bruteforce(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        1: "a b a c the the",
        2: "",  # single empty token, both engines agree on split(' ')
        3: "x y z x x y",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": list(texts),
                "text": list(texts.values()),
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": [len(t) for t in texts.values()],
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = tx.docs_feature_hash(str(tmp_path)).to_pandas()
    vecs = _brute(texts, tx.FEAT_DIMS)
    for d, v in vecs.items():
        sub = got[got["doc_id"] == d]
        dense = np.zeros(tx.FEAT_DIMS, dtype=np.int64)
        dense[sub["slot"].to_numpy()] = sub["feat_val"].to_numpy()
        assert (dense == v).all(), f"doc {d}"
    # sparsity contract: no explicit zeros
    assert (got["feat_val"] != 0).all()


def test_feature_hash_inner_product_unbiased():
    """E_salt[<phi(x), phi(y)>] = <x, y> — the signed-hashing theorem
    (Weinberger et al. 2009). Salt-averaged estimate must converge to the
    exact token-count inner product."""
    x = "a b a c d e f g h i"
    y = "a c c z w b b b q r"
    cx = pd.Series(x.split(" ")).value_counts()
    cy = pd.Series(y.split(" ")).value_counts()
    exact = int(sum(cx.get(t, 0) * cy.get(t, 0) for t in set(cx.index) | set(cy.index)))

    n_dims = 8  # small so collisions actually happen
    est = []
    for s in range(400):
        vs = _brute({0: x, 1: y}, n_dims, salt=f"s{s}:")
        est.append(int(vs[0] @ vs[1]))
    mean = float(np.mean(est))
    # exact = 7; sd of a single estimate is a few units; 400 salts → se ~0.2
    assert abs(mean - exact) < 1.0, (mean, exact)


# --- BM25 retrieval ---------------------------------------------------------


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_bm25_matches_duckdb_twin(ray_session, sf):
    eng = tx.docs_bm25(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(tx.DOCS_BM25_SQL).fetchdf()
    con.close()
    assert len(eng) == len(tx.BM25_QUERIES) * tx.BM25_TOPK
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora[eng.columns].reset_index(drop=True),
        check_dtype=True,
    )


def test_bm25_ranking_semantics(ray_session, tmp_path):
    """Saturation and length normalization on a crafted corpus: same tf →
    the SHORTER doc ranks higher; higher tf wins at equal length; scores
    match a float reference ranking."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        1: "merge " * 3 + "pad " * 5,      # tf=3, dl=9 (trailing '' token)
        2: "merge " * 3 + "pad " * 40,     # tf=3, longer → lower
        3: "merge " * 8 + "pad " * 5,      # tf=8, same length class as 1
        4: "other words only here",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": list(texts),
                "text": [t.strip() for t in texts.values()],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [len(t) for t in texts.values()],
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = tx.docs_bm25(str(tmp_path), queries=("merge",), k=4).to_pandas()
    ranks = dict(zip(out["doc_id"], out["rank"]))
    assert 4 not in ranks  # no hit, no row
    assert ranks[3] < ranks[1] < ranks[2]


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_retrieval_pipeline_matches_duckdb_twin(ray_session, sf):
    eng = tx.docs_retrieval_pipeline(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(tx.DOCS_RETRIEVAL_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora[eng.columns].reset_index(drop=True),
        check_dtype=True,
    )
    # composition observable: the filtered+normalized corpus must rank
    # differently from plain BM25 for at least one query
    plain = tx.docs_bm25(sf).to_pandas()
    m = plain.merge(eng, on=["q", "rank"], suffixes=("_p", "_r"))
    assert (m["doc_id_p"] != m["doc_id_r"]).any()


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_probe_gram_matches_duckdb_twin(ray_session, sf):
    eng = tx.docs_probe_gram(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(tx.DOCS_PROBE_GRAM_SQL).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora[eng.columns].reset_index(drop=True),
        check_dtype=True,
    )


def test_probe_gram_equals_dense_numpy(ray_session, tmp_path):
    """The distributed int64 Gram partials must equal Z.T @ Z computed
    directly on the materialized dense design matrix."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    vocab = ["the", "a", "of", "merge", "sort", "hash", "scan", "join"]
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 20))) for _ in range(37)]
    df = pd.DataFrame({"doc_id": range(37), "text": texts,
                       "source": ["s"] * 37, "n_chars": [len(t) for t in texts]})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))

    z = tx._probe_z(df, tx.FEAT_DIMS, "")
    want = z.T @ z
    got = tx.docs_probe_gram(str(tmp_path)).to_pandas()
    dense = np.zeros_like(want)
    dense[got["i"], got["j"]] = got["val"]
    iu, ju = np.triu_indices(tx.FEAT_DIMS + 2)
    assert np.array_equal(dense[iu, ju], want[iu, ju])


def test_linear_probe_matches_numpy_ridge(ray_session, tmp_path):
    """End-to-end: the distributed fit+score must reproduce a local
    numpy ridge solve on the same materialized features, and must beat
    the constant predictor on training data (the in-op raise)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(11)
    vocab = ["the", "a", "and", "of", "to", "merge", "sort", "hash", "scan",
             "join", "tree", "disk"]
    texts = [" ".join(rng.choice(vocab, rng.randint(4, 30))) for _ in range(80)]
    srcs = [("web" if i % 2 else "book") for i in range(80)]
    df = pd.DataFrame({"doc_id": range(80), "text": texts, "source": srcs,
                       "n_chars": [len(t) for t in texts]})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))

    out = tx.docs_linear_probe(str(tmp_path)).to_pandas()
    assert sorted(out["source"]) == ["book", "web"]
    assert int(out["n_docs"].sum()) == 80

    # local reference: same augmented design, same ridge
    z = tx._probe_z(df, tx.FEAT_DIMS, "")
    X = np.column_stack([z[:, : tx.FEAT_DIMS], np.ones(len(df))]).astype(np.float64)
    y = z[:, tx.FEAT_DIMS + 1].astype(np.float64)
    reg = np.eye(tx.FEAT_DIMS + 1) * float(tx.PROBE_RIDGE)
    reg[-1, -1] = 0.0
    w = np.linalg.solve(X.T @ X + reg, X.T @ y)
    pred = X @ w
    for src in ("book", "web"):
        m = np.asarray(srcs) == src
        sse_m = float(((y - pred)[m] ** 2).sum())
        sse_c = float(((y - y.mean())[m] ** 2).sum())
        want_r2 = int(np.floor((1.0 - sse_m / max(sse_c, 1e-12)) * 1e6 + 0.5))
        got_r2 = int(out.set_index("source").loc[src, "r2_ppm"])
        assert abs(got_r2 - want_r2) <= 1  # float-summation order tolerance
    assert float(((y - pred) ** 2).sum()) <= float(((y - y.mean()) ** 2).sum()) + 1.0


def test_probe_overflow_guard_raises_loudly(ray_session):
    """Past the int64-safe doc budget the y² Gram cell may have wrapped;
    the fit must refuse a caller-supplied gram whose exact n_docs cell
    exceeds the budget instead of solving on corrupted statistics."""
    import pytest

    d = tx.FEAT_DIMS
    gram = pd.DataFrame(
        {
            "i": np.array([d, d, d + 1], dtype=np.int64),
            "j": np.array([d, d + 1, d + 1], dtype=np.int64),
            "val": np.array(
                [tx.PROBE_INT64_SAFE_DOCS + 1, 1, 1], dtype=np.int64
            ),
        }
    )
    with pytest.raises(OverflowError, match="int64-safe budget"):
        tx.docs_linear_probe("/root/testdata/sf0.001", gram=gram)

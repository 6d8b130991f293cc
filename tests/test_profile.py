"""Table-profiler differentials: generated DuckDB twin at two sfs for
both profiled tables, exact-stat checks against pandas, a null-bearing
crafted table, and the HLL estimate accuracy envelope."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extractors_ray.ops import profile as pr

SF = "/root/testdata/sf0.001"


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
@pytest.mark.parametrize("table", ["orders", "documents"])
def test_profile_matches_duckdb_twin(ray_session, sf, table):
    eng = pr.table_profile(sf, table).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf}/{table}.parquet')"
    )
    ora = con.execute(pr.profile_sql(table)).fetchdf()
    con.close()
    assert len(eng) == len(pr.PROFILE_SPECS[table])
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=True)


def test_profile_exact_stats_and_accuracy(ray_session):
    eng = pr.table_profile(SF, "documents").to_pandas().set_index("column")
    df = pd.read_parquet(f"{SF}/documents.parquet")
    for c in df.columns:
        row = eng.loc[c]
        assert int(row["n_rows"]) == len(df)
        assert int(row["n_nulls"]) == int(df[c].isna().sum())
        true_d = df[c].nunique()
        est = int(row["n_distinct_est"])
        # HLL m=256 → ~6.5% rse; allow 4 sigma
        assert abs(est - true_d) <= max(3, 0.26 * true_d), (c, est, true_d)
    assert eng.loc["doc_id", "min_num"] == df["doc_id"].min()
    assert eng.loc["doc_id", "max_num"] == df["doc_id"].max()
    assert eng.loc["lang", "min_s"] == df["lang"].min()
    assert eng.loc["lang", "max_s"] == df["lang"].max()


def test_profile_nulls_and_empty_column(ray_session, tmp_path, monkeypatch):
    """Nulls counted per column; a fully-null column reports 0/'' and a
    zero distinct estimate — in BOTH engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 50
    doc_id = np.arange(n, dtype=np.int64)
    text = [None if i % 3 == 0 else f"t{i}" for i in range(n)]
    lang = [None] * n  # fully null
    pq.write_table(
        pa.table(
            {
                "doc_id": doc_id,
                "text": pa.array(text, type=pa.string()),
                "lang": pa.array(lang, type=pa.string()),
                "source": ["s"] * n,
                "n_chars": doc_id % 7,
            }
        ),
        tmp_path / "documents.parquet",
    )
    eng = pr.table_profile(str(tmp_path), "documents").to_pandas().set_index("column")
    assert int(eng.loc["text", "n_nulls"]) == sum(1 for t in text if t is None)
    assert int(eng.loc["lang", "n_nulls"]) == n
    assert int(eng.loc["lang", "n_distinct_est"]) == 0
    assert eng.loc["lang", "min_s"] == "" and eng.loc["lang", "max_s"] == ""
    assert int(eng.loc["lang", "min_num"]) == 0 and int(eng.loc["lang", "max_num"]) == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(pr.profile_sql("documents")).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        _canon(eng.reset_index()), _canon(ora), check_dtype=True
    )


def test_profile_null_clustered_blocks(ray_session, tmp_path):
    """Regression (review finding): a string column all-null in one read
    BLOCK but populated in another must not poison the min/max combine —
    8000 rows with long texts force read_parquet_sized into multiple
    blocks, lang null for the first half only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 8000
    doc_id = np.arange(n, dtype=np.int64)
    text = [("x" * 300) + str(i) for i in range(n)]
    lang = [None] * (n // 2) + ["en"] * (n - n // 2)
    pq.write_table(
        pa.table(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": pa.array(lang, type=pa.string()),
                "source": ["s"] * n,
                "n_chars": doc_id % 11,
            }
        ),
        tmp_path / "documents.parquet",
    )
    eng = pr.table_profile(str(tmp_path), "documents").to_pandas().set_index("column")
    assert int(eng.loc["lang", "n_nulls"]) == n // 2
    assert eng.loc["lang", "min_s"] == "en" and eng.loc["lang", "max_s"] == "en"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(pr.profile_sql("documents")).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        _canon(eng.reset_index()), _canon(ora), check_dtype=True
    )

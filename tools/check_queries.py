"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir; for SQL-checked entries
compares row count, column set and order-insensitive values against the
DuckDB oracle (columns sorted by name, rows sorted by all columns —
same spirit as the driver's value-hash).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # path-dependent oracles (transcript twins) must target the same scale
    os.environ["PDFX_ORACLE_SF_DIR"] = sf_dir

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} cols={len(got.columns)} ({dt:.1f}s, rows-only)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        try:
            # dtype-strict: the driver's value hash is dtype-sensitive (a
            # float64 HUGEINT-sum or a ns-vs-us timestamp fails it even when
            # the values are equal), so the local gate must be strict too.
            pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
            print(f"ok   {name}: rows={len(g)} SQL-checked ({dt:.1f}s)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:400]}")
            for col in g.columns:
                if str(g[col].dtype) != str(w[col].dtype):
                    print(f"     dtype {col}: engine={g[col].dtype} oracle={w[col].dtype}")
            failures += 1
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

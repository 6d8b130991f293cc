"""Fault-tolerance evidence for the 100 TB story: a worker CRASH
(SIGKILL-class death, not a Python exception) mid-pipeline must be
retried transparently by Ray's lineage re-execution, with byte-identical
results — the property every long multi-node run leans on.

The crash is injected once per run via a filesystem marker (workers
share the node FS in local mode); `os._exit(1)` simulates the
OOM-killer/SIGSEGV class of death the production cluster actually sees.
"""

import os

import numpy as np
import pandas as pd
import pytest


def _flaky_tokenizer(marker_dir: str):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        marker = os.path.join(marker_dir, "died")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            os._exit(1)  # worker death, not an exception
        toks = batch["text"].str.count(" ").to_numpy(np.int64) + 1
        return pd.DataFrame({"lang": batch["lang"], "n_tokens": toks,
                             "n_docs": np.int64(1)})

    return fn


def test_task_crash_recovers_exactly(ray_session, tmp_path):
    """map_batches → bucketed combine with one injected worker crash ==
    the crash-free run, row for row."""
    from pdf_extractors_ray.ops.common import bucketed_group_agg
    from pdf_extractors_ray.runtime import read_parquet_sized

    sf = "/root/testdata/sf0.01"

    def run(fn):
        ds = read_parquet_sized(
            os.path.join(sf, "documents.parquet"), columns=["lang", "text"]
        )
        agg = bucketed_group_agg(
            ds.map_batches(fn, batch_format="pandas"),
            ["lang"],
            {"n_tokens": "sum", "n_docs": "sum"},
        )
        return (
            agg.to_pandas()
            .astype({"n_tokens": np.int64, "n_docs": np.int64})
            .sort_values("lang")
            .reset_index(drop=True)
        )

    # clean run: pre-satisfied marker, no crash fires
    sat = tmp_path / "sat"
    sat.mkdir()
    (sat / "died").write_text("x")
    clean = run(_flaky_tokenizer(str(sat)))

    inj = tmp_path / "inj"
    inj.mkdir()
    crashed = run(_flaky_tokenizer(str(inj)))
    assert (inj / "died").exists()  # the crash really happened
    pd.testing.assert_frame_equal(crashed, clean)


def test_shuffle_output_stable_under_crash(ray_session, tmp_path):
    """The crash may land before OR after the exchange — either way the
    grouped result of a production op path stays exact: compare the
    crash-injected grouped token count against DuckDB."""
    import duckdb

    from pdf_extractors_ray.ops.common import bucketed_group_agg
    from pdf_extractors_ray.runtime import read_parquet_sized

    sf = "/root/testdata/sf0.01"
    inj = tmp_path / "inj2"
    inj.mkdir()
    ds = read_parquet_sized(
        os.path.join(sf, "documents.parquet"), columns=["lang", "text"]
    )
    agg = bucketed_group_agg(
        ds.map_batches(_flaky_tokenizer(str(inj)), batch_format="pandas"),
        ["lang"],
        {"n_tokens": "sum", "n_docs": "sum"},
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM read_parquet('{sf}/documents.parquet')
            GROUP BY lang ORDER BY lang"""
    ).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(
        agg.astype({"n_tokens": np.int64, "n_docs": np.int64}), want,
        check_dtype=True,
    )

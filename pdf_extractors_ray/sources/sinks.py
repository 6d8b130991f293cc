"""Sinks: Parquet (primary) and reference-compatible CSV dumps.

- ``write_parquet_partitioned`` — the engine's primary sink: a directory of
  part files (resumable layout; see state/lineage.py for the checkpointed
  variant).
- ``write_reference_csv`` — CSV-compat dump reproducing the reference's
  sink quirks: list columns stringified like Python lists
  (``mobil-oil/mobil-oil-extractor.py:170``, M38), optional QUOTE_ALL
  (``isobic/isobic_pdf_to_csv.py:72,84``), optional leading index column
  (pandas ``to_csv`` default the reference relies on).
- ``write_report_with_banner`` — the banner-prefixed report writer of
  ``mancini-beverage-invoice/invoice.py:155-166`` (S14): literal banner +
  quoted header block, then the CSV appended — a driver-side epilogue after
  the distributed write.
"""

from __future__ import annotations

import csv

import pandas as pd


def write_parquet_partitioned(ds, out_dir: str, min_rows_per_file: int | None = None):
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
    return out_dir


def _stringify_lists(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: str(list(v))
            if isinstance(v, (list, tuple)) or (hasattr(v, "tolist") and not isinstance(v, str))
            else v
        )
    return df


def write_reference_csv(ds_or_df, path: str, quote_all: bool = False, index: bool = True) -> str:
    df = ds_or_df if isinstance(ds_or_df, pd.DataFrame) else ds_or_df.to_pandas()
    df = _stringify_lists(df)
    quoting = csv.QUOTE_ALL if quote_all else csv.QUOTE_MINIMAL
    df.to_csv(path, index=index, quoting=quoting)
    return path


def write_report_with_banner(ds_or_df, path: str, banner: str, header_blocks: list[str]) -> str:
    df = ds_or_df if isinstance(ds_or_df, pd.DataFrame) else ds_or_df.to_pandas()
    df = _stringify_lists(df)
    with open(path, "w") as fh:
        text = banner + "\n"
        for i, block in enumerate(header_blocks):
            text += ('"' + block + '"') if i == 0 else block
            text += "\n"
        fh.write(text)
    df.to_csv(path, mode="a", header=True, index=True)
    return path

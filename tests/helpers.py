"""Shared comparison helpers for engine-vs-oracle equality tests."""

import pandas as pd

from pdf_extractors_ray.stages.fold import rows_to_table


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Stringify list cells, null-normalize, sort rows by all columns."""
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: repr(list(v))
            if isinstance(v, (list, tuple)) or (hasattr(v, "tolist") and not isinstance(v, str))
            else v
        )
        df[c] = df[c].astype(object).where(pd.notnull(df[c]), None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def oracle_table(df: pd.DataFrame, schema) -> pd.DataFrame:
    """Coerce oracle rows through the same Arrow schema the engine uses."""
    return rows_to_table(df.to_dict("records"), schema).to_pandas()

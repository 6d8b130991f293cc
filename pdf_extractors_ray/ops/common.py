"""Shared helpers for scale operators.

Money/float determinism: distributed float summation is order-dependent, so
any aggregate that must compare exactly against a SQL oracle is computed in
integer *cents* — ``floor(x*100 + 0.5)`` per row (the same IEEE ops the
oracle SQL uses) summed as int64. Exact on both sides, hash-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CENTS_SQL = "CAST(FLOOR({col}*100 + 0.5) AS BIGINT)"


def cents(x) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5).astype(np.int64)


def grouped_sums(ds, keys: list[str], sum_cols: list[str], count_alias: str | None = None):
    """Grouped sum with per-batch partial pre-aggregation.

    A bare ``groupby().aggregate()`` shuffles every row; this combines
    inside ``map_batches`` first (one partial row per key per batch), then
    shuffles only the partials (ray_guide: "Aggregation at scale").
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        agg = batch.groupby(keys, as_index=False, sort=False)[sum_cols].sum()
        if count_alias:
            sizes = batch.groupby(keys, sort=False).size().reset_index(name=count_alias)
            agg = agg.merge(sizes, on=keys)
        return agg

    partial = ds.map_batches(_partial, batch_format="pandas")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partial.groupby(keys).aggregate(*aggs)


def cast_us(ds, cols: list[str]):
    """Cast timestamp columns to microsecond unit after an aggregation.

    Ray's pandas-block groupby reduce coerces datetime64[us] keys back to
    ns; DuckDB TIMESTAMP is us, and the driver's value hash is
    dtype-sensitive, so time-bucket outputs re-cast here post-aggregate.
    """

    def _cast(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            batch[c] = batch[c].astype("datetime64[us]")
        return batch

    return ds.map_batches(_cast, batch_format="pandas")


def broadcast(obj):
    """Put a small lookup object in the object store once; stages fetch it
    in ``__init__``/first use instead of re-shipping per batch."""
    import ray

    return ray.put(obj)

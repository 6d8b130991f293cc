"""Ordered per-conversation session folds.

The reference's in-document parsing is a forward-only ordered scan with
carried state (SURVEY.md §2.9, ST1-ST3). In Ray Data that becomes::

    ds.groupby("conv_id").map_groups(fold)

with an explicit in-group sort on ``turn_idx`` inside the UDF — the
``groupby`` co-locates each conversation (the ONE shuffle the engine needs,
SURVEY.md §7.4), and group-local ordering is restored deterministically no
matter how the input blocks arrived (the synthesizer writes rows shuffled
on purpose).

Each fold returns a ``pyarrow.Table`` built against the family's fixed
schema so empty groups unify cleanly and list columns stay native Arrow.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

FoldFn = Callable[[list[str], list[int]], list[dict]]


def rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    """dict rows → Arrow table with a fixed schema (ints coerced, absent
    keys → null)."""
    if not rows:
        return schema.empty_table()
    cols = {}
    for field in schema:
        vals = [r.get(field.name) for r in rows]
        if pa.types.is_integer(field.type):
            vals = [None if v is None else int(v) for v in vals]
        elif pa.types.is_string(field.type):
            vals = [None if v is None else str(v) for v in vals]
        cols[field.name] = pa.array(vals, field.type)
    return pa.Table.from_pydict(cols, schema=schema)


def make_group_fold(fold_fn: FoldFn, schema: pa.Schema):
    """Wrap a per-conversation oracle fold as a ``map_groups`` UDF.

    The UDF receives one conversation as a dict of numpy arrays (Ray's
    default group batch format — zero pandas conversion), sorts it by
    ``turn_idx``, folds, and emits schema-stable Arrow.
    """

    def _fold_group(group: dict) -> pa.Table:
        turn_idx = group["turn_idx"]
        order = np.argsort(turn_idx, kind="stable")
        texts = [str(t) for t in np.asarray(group["text"], dtype=object)[order]]
        idxs = [int(i) for i in np.asarray(turn_idx)[order]]
        conv_id = str(group["conv_id"][0])
        rows = fold_fn(texts, idxs)
        for r in rows:
            r["conv_id"] = conv_id
        return rows_to_table(rows, schema)

    return _fold_group


def fold_conversations(ds, fold_fn: FoldFn, schema: pa.Schema):
    """``groupby(conv_id)`` + ordered in-group fold → schema-stable Dataset."""
    return ds.groupby("conv_id").map_groups(
        make_group_fold(fold_fn, schema), batch_format="numpy"
    )

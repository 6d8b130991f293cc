"""End-to-end extraction pipelines (the flagship).

Shape (SURVEY.md §7.1): pruned Parquet read → vectorized per-turn stages →
ONE ``groupby(conv_id)`` shuffle per family → ordered in-group fold →
(census only) embarrassingly-parallel downstream stages over household rows.

Scale notes:
- the read prunes both columns and rows (``filter=pc.field("tool") == f`` —
  row-group predicate pushdown), so each family pipeline only moves its own
  turns;
- folds run inside ``map_groups`` after the single conv_id shuffle; nothing
  downstream of the fold shuffles again (persons/summary are per-row maps);
- stateful stages (compiled regex banks) are callable classes in actor
  pools — compiled once per actor, used per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..oracle import catalog as _catalog
from ..oracle import census as _census
from ..oracle import grid as _grid
from ..oracle import invoice as _invoice
from ..oracle import layout as _layout
from ..oracle import persons as _persons
from ..oracle import table as _table
from ..stages.fold import fold_conversations, make_group_fold, rows_to_table
from ..stages.invoice_extract import FIELD_PREFIX, InvoiceFieldExtractor
from . import schemas

TURN_COLUMNS = ["conv_id", "turn_idx", "text", "tool"]


def family_dataset(path: str, family: str):
    """Column- and row-pruned read of one family's turns."""
    import ray.data as rd

    return rd.read_parquet(
        path, columns=TURN_COLUMNS, filter=(pc.field("tool") == family)
    )


# ---------------------------------------------------------------------------
# simple fold families: read → groupby(conv_id) → ordered fold


def extract_catalog(path: str):
    return fold_conversations(
        family_dataset(path, "catalog"), _catalog.extract_catalog_conv, schemas.CATALOG_SCHEMA
    )


def extract_layout(path: str):
    return fold_conversations(
        family_dataset(path, "layout"), _layout.extract_layout_conv, schemas.LAYOUT_SCHEMA
    )


def extract_table(path: str):
    return fold_conversations(
        family_dataset(path, "table"), _table.extract_table_conv, schemas.TABLE_SCHEMA
    )


def extract_grid(path: str):
    return fold_conversations(
        family_dataset(path, "grid"), _grid.extract_grid_conv, schemas.GRID_SCHEMA
    )


# ---------------------------------------------------------------------------
# invoice: vectorized RE2 bank (actor pool) → light header/LOCF fold


def _fold_invoice_group(group: dict) -> pa.Table:
    """Group fold over pre-extracted field columns (no regex work here)."""
    import numpy as np

    order = np.argsort(group["turn_idx"], kind="stable")
    idxs = [int(i) for i in np.asarray(group["turn_idx"])[order]]
    field_cols = {
        name: np.asarray(group[FIELD_PREFIX + name], dtype=object)[order]
        for name in _invoice.PATTERNS
    }
    extracted_list = []
    for i in range(len(idxs)):
        extracted_list.append(
            {name: vals[i] for name, vals in field_cols.items() if vals[i] is not None}
        )
    rows = _invoice.rows_from_extracted(extracted_list, idxs)
    conv_id = str(group["conv_id"][0])
    for r in rows:
        r["conv_id"] = conv_id
    return rows_to_table(rows, schemas.INVOICE_SCHEMA)


def extract_invoice(path: str, concurrency=(1, 8), batch_size: int = 4096):
    ds = family_dataset(path, "invoice")
    ds = ds.map_batches(
        InvoiceFieldExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return ds.groupby("conv_id").map_groups(_fold_invoice_group, batch_format="numpy")


# ---------------------------------------------------------------------------
# census: stage A fold → households; summary + persons are per-row maps


def extract_census_households(path: str):
    return fold_conversations(
        family_dataset(path, "census"), _census.extract_census_conv, schemas.HOUSEHOLD_SCHEMA
    )


class CensusSummarizer:
    """Per-household summary projection (prepare_first_csv semantics)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for h in batch.to_pylist():
            row = _census.summarize_household(h)
            row["conv_id"] = h["conv_id"]
            rows.append(row)
        return rows_to_table(rows, schemas.CENSUS_SUMMARY_SCHEMA)


class PersonsExtractor:
    """Stage-B kinship resolution, one household at a time.

    Households are independent (within-group joins only, SURVEY.md §2.4),
    so this is a plain ``map_batches`` stage — NO shuffle. The compiled
    regex bank lives in module state, loaded once per actor.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for h in batch.to_pylist():
            for p in _persons.extract_persons_for_household(h):
                p["conv_id"] = h["conv_id"]
                rows.append(p)
        return rows_to_table(rows, schemas.PERSONS_SCHEMA)


def extract_census_summary(path: str, households=None):
    ds = households if households is not None else extract_census_households(path)
    return ds.map_batches(CensusSummarizer, batch_format="pyarrow", concurrency=(1, 4))


def extract_census_persons(path: str, households=None, concurrency=(1, 8)):
    ds = households if households is not None else extract_census_households(path)
    return ds.map_batches(PersonsExtractor, batch_format="pyarrow", concurrency=concurrency)


# ---------------------------------------------------------------------------

EXTRACTORS = {
    "catalog": extract_catalog,
    "invoice": extract_invoice,
    "layout": extract_layout,
    "table": extract_table,
    "grid": extract_grid,
    "census_households": extract_census_households,
    "census_summary": extract_census_summary,
    "census_persons": extract_census_persons,
}


def extract_family(path: str, name: str):
    return EXTRACTORS[name](path)


def run_all_families(path: str, materialize_households: bool = False) -> dict:
    """All extraction datasets (lazy); callers consume/write them.

    ``materialize_households=True`` pins the (small, reduced) household
    dataset so its two consumers (summary, persons) don't each re-execute
    the census fold — the allowed "small reused intermediate" case.
    """
    households = extract_census_households(path)
    if materialize_households:
        households = households.materialize()
    return {
        "catalog": extract_catalog(path),
        "invoice": extract_invoice(path),
        "layout": extract_layout(path),
        "table": extract_table(path),
        "grid": extract_grid(path),
        "census_households": households,
        "census_summary": extract_census_summary(path, households),
        "census_persons": extract_census_persons(path, households),
    }

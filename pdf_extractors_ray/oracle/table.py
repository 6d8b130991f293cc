"""Detected-table rows: header broadcast + merged-cell fix-up (KNR family).

Reimplements ``knr-property-mgmt/knr_property.py``:

- column names come from the conversation's first row (page-0 header,
  ``:9-13,34-35``); every subsequent header row is skipped (``:39-40``),
- merged-cell fix-up: a first cell ``"Total <income> <expense>"`` is
  re-split into columns 0 / 5 / 6 (``:50-55`` ``enrich_data``),
- each data row is zipped with the column names (``:41-47``).

Transcript model: one turn = one detected table row; ``text`` is a JSON
list of cell strings; turn 0 carries the header row.
"""

from __future__ import annotations

import json


def fix_merged_total(cells: list) -> list:
    """Re-split a merged "Total X Y" first cell into cols 0/5/6 (:50-55)."""
    if str(cells[0]).startswith("Total"):
        parts = str(cells[0]).split(" ")
        cells = list(cells)
        cells[0] = parts[0]
        if len(parts) > 1 and len(cells) > 5:
            cells[5] = parts[1]
        if len(parts) > 2 and len(cells) > 6:
            cells[6] = parts[2]
    return cells


def extract_table_conv(texts: list[str], turn_idxs: list[int]) -> list[dict]:
    rows: list[dict] = []
    columns: list[str] | None = None
    for pos, (text, tidx) in enumerate(zip(texts, turn_idxs)):
        try:
            cells = json.loads(text)
        except json.JSONDecodeError:
            continue
        if not isinstance(cells, list):
            continue
        if pos == 0:
            columns = [str(c) for c in cells]
            continue  # header row is data-skipped on every page (:39-40)
        if columns is None:
            continue
        cells = fix_merged_total(cells)
        row = {col: (cells[i] if i < len(cells) else None) for i, col in enumerate(columns)}
        row["ref_turn"] = int(tidx)
        rows.append(row)
    return rows

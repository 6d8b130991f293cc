"""Grid-cell cleanup bank (Mancini beverage-invoice family).

Reimplements the pandas post-processing of
``mancini-beverage-invoice/invoice.py:135-153`` over one conversation:

- column projection: drop raw columns 2, 5 and 7 (``:138``),
- row predicates on the RAW cell values: keep rows with
  ``len(col1) >= 2`` and ``2 <= len(col4) < 7`` (``:141-143``),
- scalar cleanups: strip + remove ``|`` from every cell (``:146``),
  keep digits only in columns 0, 1, 3 for data rows (the header row,
  row 0, is exempt, ``:147-149``), and remove ``;`` from column 3 for all
  rows (``:150``).

Transcript model: one turn = one raw extracted grid row; ``text`` is a JSON
list of 8 cell strings; turn 0 is the header row (kept in the output like
the reference keeps its row 0). Output columns are named after the
surviving raw indices: ``c0, c1, c3, c4, c6``.
"""

from __future__ import annotations

import json
import re

OUTPUT_COLUMNS = ["ref_turn", "c0", "c1", "c3", "c4", "c6"]
_KEPT = (0, 1, 3, 4, 6)
_NON_DIGIT = re.compile(r"\D")


def extract_grid_conv(texts: list[str], turn_idxs: list[int]) -> list[dict]:
    rows: list[dict] = []
    for pos, (text, tidx) in enumerate(zip(texts, turn_idxs)):
        try:
            cells = json.loads(text)
        except json.JSONDecodeError:
            continue
        if not isinstance(cells, list) or len(cells) < 8:
            continue
        cells = [str(c) for c in cells]
        # row predicates on raw values (:141-143)
        if len(cells[1]) < 2 or len(cells[4]) < 2 or len(cells[4]) >= 7:
            continue
        vals = {}
        for i in _KEPT:
            v = cells[i].strip().replace("|", "")  # (:146)
            if pos != 0 and i in (0, 1, 3):  # header row exempt (:147-149)
                v = _NON_DIGIT.sub("", v)
            if i == 3:  # ';' removal applies to every row (:150)
                v = v.replace(";", "")
            vals[f"c{i}"] = v
        rows.append({"ref_turn": int(tidx), **vals})
    return rows

"""Table-region detection + grid-line synthesis from RAW word boxes.

Closes SURVEY §2.1 S8 and §2.2 M40/M41: instead of consuming pre-detected
header/table payloads, these folds compute the regions themselves from
``{"boxes": [{text,x0,y0,x1,y1,font,size}, ...]}`` payloads.

Reference parity:

- S8  header-cell detection — the reference calls PyMuPDF ``find_tables``
  and records each header cell's x0 with its name
  (``us-ffiec-demographic-Info/ffiec-census.py:61-77``,
  ``knr-property-mgmt/knr_property.py:28-36``). Our detector recovers the
  same ``(x0, name)`` boundary list from the word boxes directly: cluster
  boxes into row bands by y, take the topmost band as the header row.
- M40 grid-line synthesis — ``mancini-beverage-invoice/invoice.py:29-44``:
  horizontal lines from the 'PRICE' anchor's bottom with the
  +7 / +6 / (+3.5 / +6)×19 recurrence (6 pt char height, 3.5 pt gap) and
  the fixed 14-entry vertical line list (``:42``); page 1 prepends an
  extra 0.5 line (``:17-18``). ``grid_rows_from_boxes`` then bins boxes
  into the cells between every pair of CONSECUTIVE lines, which is how
  pdfplumber's explicit strategy behaves — the thin 3.5 pt gap bands
  produce empty rows that the cleanup's length predicates later drop.
- M41 region crops — fixed-bbox po-box / sold-to crops
  (``invoice.py:72-86``). The crop GEOMETRY is computed here; the OCR of
  the crop is modeled as identity on the text layer (this container has
  no OCR engine — the deterministic-fake policy of ops/multimodal.py).
- M42 post-processing (``invoice.py:135-153``) applied to the synthesized
  13-column grid literally: drop raw columns {2,5,7}, row predicates on
  RAW c1/c4, strip+'|' removal, digit-only on 0/1/3 for every surviving
  row except the conversation's first RAW row (the reference's
  ``df.loc[1:]`` label slice), ';' removal on column 3.
"""

from __future__ import annotations

import json
import re

_NON_DIGIT = re.compile(r"\D")

# the reference's fixed vertical lines (invoice.py:42): "for total 4 is
# character width" — 14 lines → 13 column bands
MANCINI_VERTICAL_LINES = [5, 37, 74, 82.7, 102, 139, 176, 320, 400, 448, 488, 528, 612, 654]
PO_BOX_BBOX = (35.0, 60.0, 256.0, 80.0)  # invoice.py:73
SOLD_TO_BBOX = (20.0, 85.0, 256.0, 160.0)  # invoice.py:81
LINE_ITEMS_BBOX = (20.0, 180.0, 675.0, 385.0)  # invoice.py:90

_N_GRID_COLS = len(MANCINI_VERTICAL_LINES) - 1
_DROPPED = frozenset({2, 5, 7})  # invoice.py:138
KEPT_GRID_COLS = [i for i in range(_N_GRID_COLS) if i not in _DROPPED]
OUTPUT_COLUMNS = ["ref_turn"] + [f"c{i}" for i in KEPT_GRID_COLS]


def cluster_rows(boxes: list[dict], y_tol: float = 4.0) -> list[list[dict]]:
    """Group boxes into row bands by y0 (new band when the y step exceeds
    ``y_tol``); bands top-to-bottom, boxes left-to-right within a band."""
    ordered = sorted(boxes, key=lambda b: (float(b.get("y0", 0.0)), float(b.get("x0", 0.0))))
    bands: list[list[dict]] = []
    anchor = None
    for box in ordered:
        y = float(box.get("y0", 0.0))
        if anchor is None or y - anchor > y_tol:
            bands.append([])
            anchor = y
        bands[-1].append(box)
    for band in bands:
        band.sort(key=lambda b: float(b.get("x0", 0.0)))
    return bands


def detect_header(boxes: list[dict]) -> tuple[list[tuple[float, str]], list[list[dict]]]:
    """S8: topmost row band = table header (PyMuPDF ``tab.cells[x][0]``
    analogue: each header cell contributes its x0 + name, in x order).
    Returns (header boundary list, remaining data bands)."""
    bands = cluster_rows(boxes)
    if not bands:
        return [], []
    header = [(float(b.get("x0", 0.0)), str(b.get("text", ""))) for b in bands[0]]
    return header, bands[1:]


def mancini_horizontal_lines(price_bottom: float, first_page: bool = False) -> list[float]:
    """The exact line recurrence of invoice.py:17-44 (differentially tested
    against the reference's own loop via a recording pdfplumber fake)."""
    lines: list[float] = [0.5] if first_page else []
    coord = price_bottom + 7
    lines.append(coord)
    coord = coord + 6
    lines.append(coord)
    j = 1
    while j < 20:
        coord = coord + 3.5
        lines.append(coord)
        coord = coord + 6
        lines.append(coord)
        j = j + 1
    return lines


def grid_rows_from_boxes(boxes: list[dict], h_lines: list[float],
                         v_lines: list[float]) -> list[list[str]]:
    """pdfplumber explicit-strategy equivalent: one row per consecutive
    horizontal-line pair, one cell per consecutive vertical-line pair; a
    cell's text is the x-ordered concatenation of the boxes whose CENTER
    falls inside the cell rect."""
    rows: list[list[str]] = []
    centered = [
        (
            (float(b.get("x0", 0.0)) + float(b.get("x1", 0.0))) / 2.0,
            (float(b.get("y0", 0.0)) + float(b.get("y1", 0.0))) / 2.0,
            str(b.get("text", "")),
        )
        for b in boxes
    ]
    for i in range(len(h_lines) - 1):
        top, bot = h_lines[i], h_lines[i + 1]
        row = []
        for j in range(len(v_lines) - 1):
            left, right = v_lines[j], v_lines[j + 1]
            cell = [
                (cx, t) for cx, cy, t in centered
                if left <= cx < right and top <= cy < bot
            ]
            cell.sort()
            row.append(" ".join(t for _cx, t in cell))
        rows.append(row)
    return rows


def crop_text(boxes: list[dict], bbox: tuple[float, float, float, float]) -> str:
    """M41 crop: boxes fully inside the bbox, joined in reading order
    (bands joined with newline — the shape OCR of the crop would yield)."""
    x0, y0, x1, y1 = bbox
    inside = [
        b for b in boxes
        if float(b.get("x0", 0.0)) >= x0 and float(b.get("x1", 0.0)) <= x1
        and float(b.get("y0", 0.0)) >= y0 and float(b.get("y1", 0.0)) <= y1
    ]
    bands = cluster_rows(inside)
    return "\n".join(" ".join(str(b.get("text", "")) for b in band) for band in bands)


def _find_price_bottom(boxes: list[dict]) -> float | None:
    """The reference searches the page for 'PRICE' and anchors the grid on
    the first hit's bottom (invoice.py:22-27); falls back to 7."""
    for b in sorted(boxes, key=lambda b: (float(b.get("y0", 0.0)), float(b.get("x0", 0.0)))):
        if "PRICE" in str(b.get("text", "")):
            return float(b.get("y1", 0.0))
    return None


# ---------------------------------------------------------------------------
# conversation folds


def extract_layout_detected_conv(texts: list[str], turn_idxs: list[int]) -> list[dict]:
    """FFIEC layout with OUR OWN header detection (S8): the first turn
    carrying boxes provides the header via the topmost row band; remaining
    bands of that turn and every later turn's bands are data rows, binned
    and filtered with the same Arial + County-Code semantics as the
    pre-detected layout fold (oracle/layout.py)."""
    from .layout import bin_column

    rows: list[dict] = []
    header: list[tuple[float, str]] | None = None
    columns: list[str] = []
    for text, tidx in zip(texts, turn_idxs):
        try:
            payload = json.loads(text)
        except json.JSONDecodeError:
            continue
        boxes = payload.get("boxes", [])
        if header is None:
            header, data_bands = detect_header(boxes)
            if not header:
                header = None
                continue
            columns = [name for _x, name in header]
        else:
            data_bands = cluster_rows(boxes)
        for band in data_bands:
            row: dict = {c: None for c in columns}
            for box in band:
                if box.get("font") != "Arial":  # style predicate (ffiec :40-44)
                    continue
                col = bin_column(float(box.get("x0", 0.0)), header)
                if col:
                    row[col] = box.get("text")
            if row.get("County Code"):  # completeness predicate (:45-46)
                row["ref_turn"] = int(tidx)
                rows.append(row)
    return rows


def extract_table_detected_conv(texts: list[str], turn_idxs: list[int]) -> list[dict]:
    """KNR detected-table fold from raw boxes (S8 for the find_tables
    consumer in ``knr-property-mgmt/knr_property.py:28-47``): the first
    turn's topmost band provides the column names + x boundaries
    (``initialize_column_names``, page-0 only); every band detected as the
    header row again on later pages is data-skipped (``:39-40`` skips row
    0 per page); data bands are binned into cells per header column,
    merged-total fix-up applied (``:50-55``), rows zipped with the column
    names (``:41-47``)."""
    from .layout import bin_column
    from .table import fix_merged_total

    rows: list[dict] = []
    header: list[tuple[float, str]] | None = None
    columns: list[str] = []
    for pos, (text, tidx) in enumerate(zip(texts, turn_idxs)):
        try:
            payload = json.loads(text)
        except json.JSONDecodeError:
            continue
        boxes = payload.get("boxes", [])
        bands = cluster_rows(boxes)
        if not bands:
            continue
        if header is None:
            header = [(float(b.get("x0", 0.0)), str(b.get("text", ""))) for b in bands[0]]
            columns = [name for _x, name in header]
            data_bands = bands[1:]
        else:
            # each page's own header row is skipped (the reference skips
            # row 0 of every page's table)
            data_bands = bands[1:] if pos > 0 and len(bands) > 1 else bands
        for band in data_bands:
            cells = ["" for _ in columns]
            for box in band:
                col = bin_column(float(box.get("x0", 0.0)), header)
                if not col:
                    continue
                i = columns.index(col)
                cells[i] = f"{cells[i]} {box.get('text', '')}".strip() if cells[i] else str(box.get("text", ""))
            cells = fix_merged_total(cells)
            row = {c: cells[i] for i, c in enumerate(columns)}
            row["ref_turn"] = int(tidx)
            rows.append(row)
    return rows


def extract_grid_detected_conv(texts: list[str], turn_idxs: list[int]) -> list[dict]:
    """Mancini grid synthesized from raw boxes (M40 + M42): per turn, find
    the PRICE anchor, build the explicit line grid, bin boxes to 13-column
    raw rows; then the reference's post-processing bank over the
    conversation's accumulated raw rows."""
    raw_rows: list[tuple[int, list[str]]] = []
    for pos, (text, tidx) in enumerate(zip(texts, turn_idxs)):
        try:
            payload = json.loads(text)
        except json.JSONDecodeError:
            continue
        boxes = payload.get("boxes", [])
        pb = _find_price_bottom(boxes)
        if pb is None:
            pb = 7.0  # reference fallback coord (invoice.py:26-27)
        h_lines = mancini_horizontal_lines(pb, first_page=(pos == 0))
        for cells in grid_rows_from_boxes(boxes, h_lines, MANCINI_VERTICAL_LINES):
            raw_rows.append((int(tidx), cells))

    rows: list[dict] = []
    for raw_idx, (tidx, cells) in enumerate(raw_rows):
        # row predicates on RAW cell values (invoice.py:141-143)
        if len(cells[1]) < 2 or len(cells[4]) < 2 or len(cells[4]) >= 7:
            continue
        vals = {}
        for i in KEPT_GRID_COLS:
            v = cells[i].strip().replace("|", "")  # (:146)
            if raw_idx != 0 and i in (0, 1, 3):  # df.loc[1:] exemption (:147-149)
                v = _NON_DIGIT.sub("", v)
            if i == 3:  # ';' removal applies to every row (:150)
                v = v.replace(";", "")
            vals[f"c{i}"] = v
        rows.append({"ref_turn": tidx, **vals})
    return rows


def extract_grid_crops_conv(texts: list[str], turn_idxs: list[int]) -> list[dict]:
    """M41: the page-1 po-box / sold-to crops (invoice.py:110-115 runs them
    only for i == 0), one row per conversation."""
    for pos, (text, tidx) in enumerate(zip(texts, turn_idxs)):
        if pos != 0:
            break
        try:
            payload = json.loads(text)
        except json.JSONDecodeError:
            return []
        boxes = payload.get("boxes", [])
        return [
            {
                "ref_turn": int(tidx),
                "po_box": crop_text(boxes, PO_BOX_BBOX),
                "sold_to": crop_text(boxes, SOLD_TO_BBOX),
            }
        ]
    return []

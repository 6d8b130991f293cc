"""Invoice key:value regex bank + header broadcast + forward-fill.

Reimplements the semantics of
``nordic-logistics-invoice/nordic-invoice.py`` over one conversation:

- field pattern bank (``:8-23``) applied per fragment (``:103-115``),
- the lost-anchor re-prefix quirk for fragments starting with ":"
  (``:69-70``),
- fragment 0 = invoice header; its Invoice / Invoice Date / Due Date /
  Customer Number are broadcast into every later order row (``:72-82``),
- LOCF forward-fill of ``Delivery date`` over rows in order (``:94-100``).

In the transcript model a conversation is one invoice document and each
turn is one OCR fragment (the reference splits page text on the
``Order No.`` anchor, ``:65-71``; our synthesizer emits fragments directly).
The reference's ``Page`` column (page ordinal string) becomes the
fragment's ``turn_idx`` as a string.
"""

from __future__ import annotations

import re

# field pattern bank (nordic-invoice.py:8-23) — config-as-data, part of the
# observable semantics
PATTERNS: dict[str, str] = {
    "Invoice": r"Invoice\s(\d+)",
    "Invoice Date": r"Invoice Date:\s*(\d{2}\.\d{2}\.\d{4})",
    "Order No.": r"Order No.:\s*(\d+)",
    "Ext. order no.": r"Ext\. order no\.\s*:\s*(\w+(?:-\w+)?)",
    "Customer Number": r"Customer Number:\s*(\d+)",
    "Loading date": r"Loading date\s*(\d{2}\.\d{2}\.\d{4})",
    "Delivery date": r"Delivery date\s*(\d{2}\.\d{2}\.\d{4})",
    "Vessel Name": r"Vessel Name:\s*(.+?)\sContainer type:",
    "Port of loading": r"Port of loading:\s*©?\s*(\w+)",
    "Port of delivery": r"Port of delivery:\s*(\w+)",
    "Total amount without VAT": r"Total amount without VAT\s*((?:\d{1,3}(?:\s?\d{3})*),\d{2} NOK)",
    "Due Date": r"Due Date:\s*(\d{2}\.\d{2}\.\d{4})",
    "Tour No.": r"Tour No.:\s*(\d+)",
}

COMPILED_PATTERNS = {k: re.compile(v) for k, v in PATTERNS.items()}

OUTPUT_COLUMNS = [
    "Page", "Invoice", "Invoice Date", "Order No.", "Ext. order no.",
    "Customer Number", "Loading date", "Delivery date", "Vessel Name",
    "Port of loading", "Port of delivery", "Total amount without VAT",
    "Due Date", "Tour No.",
]

_HEADER_FIELDS = ("Invoice", "Invoice Date", "Due Date", "Customer Number")


def extract_fields(text: str, patterns=None) -> dict[str, str]:
    """One ``re.search`` per field per fragment (nordic-invoice.py:103-115)."""
    patterns = patterns or COMPILED_PATTERNS
    out = {}
    for key, pat in patterns.items():
        m = pat.search(text)
        if m:
            out[key] = m.group(1)
    return out


def rows_from_extracted(extracted_list: list[dict], turn_idxs: list[int]) -> list[dict]:
    """Header broadcast + row assembly + LOCF over per-fragment field dicts.

    Shared by the oracle (fields from Python ``re``) and the Ray pipeline
    (fields from the vectorized RE2 stage) so the fold semantics exist in
    exactly one place.
    """
    invoice_num: str | int = 0
    invoice_date = due_date = customer_number = None
    rows: list[dict] = []
    for pos, (extracted, tidx) in enumerate(zip(extracted_list, turn_idxs)):
        if not extracted:
            continue
        if pos == 0:
            # header fragment: capture broadcast fields (:73-77); the
            # reference guards each read on the presence of 'Invoice' (:89-91)
            has_inv = "Invoice" in extracted
            invoice_num = extracted.get("Invoice") if has_inv else None
            invoice_date = extracted.get("Invoice Date") if has_inv else None
            due_date = extracted.get("Due Date") if has_inv else None
            customer_number = extracted.get("Customer Number") if has_inv else None
        else:
            row = {k: None for k in OUTPUT_COLUMNS}
            row["Page"] = str(tidx)
            row["Invoice"] = invoice_num
            row["Invoice Date"] = invoice_date
            row["Due Date"] = due_date
            row["Customer Number"] = customer_number
            row.update(extracted)
            rows.append(row)
    # LOCF forward-fill of Delivery date (:94-100)
    delivery = None
    for row in rows:
        if row["Delivery date"] is not None:
            delivery = row["Delivery date"]
        else:
            row["Delivery date"] = delivery
    return rows


def extract_invoice_conv(texts: list[str], turn_idxs: list[int]) -> list[dict]:
    """Fold one conversation's ordered fragments into order rows."""
    extracted_list = []
    for text in texts:
        if text.startswith(":"):
            text = "Order No." + text  # lost-anchor re-prefix (:69-70)
        extracted_list.append(extract_fields(text))
    return rows_from_extracted(extracted_list, turn_idxs)

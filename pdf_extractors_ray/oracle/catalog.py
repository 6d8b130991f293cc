"""Catalog line state machine (mobil-oil family).

Reimplements the ordered-fold semantics of
``mobil-oil/mobil-oil-extractor.py:31-121`` (``parse_lines``) and the
page-banner prefix strip (``:134-144`` ``remove_duplicate_lines``) over one
conversation's ordered turn texts.

Carried state: ``(manufacturer, year, model, engine, oils, valid)`` with a
one-line lookahead for the manufacturer rule (``:50-51``). A row is emitted
each time context closes (flush-on-transition ``:53-54,65-66,78-79,100`` and
a trailing flush at end of conversation, ``:118-119``).

Divergences (documented, deliberate):
- the reference's per-record ``list(set(oils))`` is hash-order-unstable
  across processes (``:54``); we canonicalize to ``sorted(set(oils))``
  (SURVEY.md §7.5 #2);
- the reference emits the fitz page number; our input unit is the transcript
  turn, so rows carry ``ref_turn`` = the ``turn_idx`` of the emitting line.
"""

from __future__ import annotations

import re

BANNER = "FILTERS FOR PASSENGER CARS AND LIGHT TRUCKS/ FILTRES POUR VOITURES PARTICULIERES ET"

# boilerplate bank (mobil-oil-extractor.py:6-29): literal lines + startswith
# prefixes that the parser must skip
_SKIP_LITERALS = frozenset(
    {
        "MANUFACTURER-MODEL-ENGINE",
        "FABRICANT-MODELE-MOTEUR",
        "FABRICANTE-MODELO-MOTOR",
        "Oil",
        BANNER,
        "VEHICULES UTILITAIRES LEGERS/ FILTROS PARA AUTOMOVILES Y CAMIONES LIGEROS",
        "Voir las page 2 pour une explication des renvois en bas de la page.",
        "Consulte la página 2 para obtener una explicación de las nota en la parte inferior de la página",
    }
)
_SKIP_PREFIXES = (
    "3 Availability limited to existing inventory.",
    "1 25 PSI by-pass valve Oil Filter",
    "threaded engine stud.",
    "574 Models without engine oil cooler.",
    "threads - Only use on VIN X - Sedan models",
    "Recommended.",
    "Filter recommended.",
    "Premium Filter Recommended.",
    "550 Synthetic Oil Application.",
    "For vehicles where the filter housing cap has a center post.",
)

RE_MANUFACTURER = re.compile(r"^[A-Z ]{2,}$|([A-Z ]{2,})\W\(cont'd\)")
RE_YEAR = re.compile(r"^\d{4}$|(^\d{4})\W\(cont'd\)$")
RE_MODEL = re.compile(r"^[A-Z0-9a-z\-\s\(\)]+$")
RE_MODEL_SAAB = re.compile(r"^[A-Z0-9a-z\-\s\(\)\.]+$")
RE_ENGINE = re.compile(r"^[A-Za-z0-9\s\.\(\)\/\-\:\,]+$")
RE_OILCODE = re.compile(r"M1C*-\d+\w|F\d{5}|Pri\.\sF\d{5}|Sec\.\sL\/F|w\/\sOil\sCooler\sM1C*-\d+\w")
_ELECTRIC_GAS = ("(Electric/Gas)", "(Electric/Gas)(Mexico)", "(Electric/Gas)(Canada)")


def is_boilerplate_line(line: str) -> bool:
    """True when the parser body must skip the line (inverse of the
    reference's ``valid_line``, mobil-oil-extractor.py:6-29)."""
    return line in _SKIP_LITERALS or line.startswith(_SKIP_PREFIXES)


OUTPUT_COLUMNS = ["ref_turn", "manufacturer", "year", "model", "engine", "oils"]


def extract_catalog_conv(texts: list[str], turn_idxs: list[int]) -> list[dict]:
    """Run the catalog state machine over one conversation, in turn order."""
    # prefix strip: drop turns before the first page banner (:134-144)
    start = 0
    for i, t in enumerate(texts):
        if t.strip() == BANNER:
            start = i
            break
    lines = [t.strip() for t in texts[start:]]
    idxs = turn_idxs[start:]

    rows: list[dict] = []
    manufacturer = year = model = engine = None
    oils: list[str] = []
    valid = False

    def emit(ref_turn: int) -> None:
        rows.append(
            {
                "ref_turn": int(ref_turn),
                "manufacturer": manufacturer,
                "year": year,
                "model": model,
                "engine": engine,
                "oils": sorted(set(oils)),
            }
        )

    n = len(lines)
    for i, line in enumerate(lines):
        if valid and not is_boilerplate_line(line):
            nxt = lines[i + 1] if i + 1 < n else ""
            # manufacturer: ALL-CAPS line whose next line is a year (:50-61)
            if RE_MANUFACTURER.match(line) and RE_YEAR.match(nxt):
                if manufacturer and model and engine and oils:
                    emit(idxs[i])
                manufacturer = line.split(" ")[0]
                model = engine = None
                oils = []
                continue
            # year (:63-71)
            if RE_YEAR.match(line):
                if manufacturer and model and engine and oils:
                    emit(idxs[i])
                year = line.split(" ")[0]
                model = engine = None
                oils = []
                continue
            # model — SAAB admits dots in the model regex (:74-93)
            model_re = RE_MODEL_SAAB if manufacturer == "SAAB" else RE_MODEL
            if model_re.match(line) and manufacturer and not RE_OILCODE.match(line):
                if model and engine and oils:
                    emit(idxs[i])
                model = line
                engine = None
                oils = []
                continue
            # engine / oil-code branch (:96-109); engines are space-stripped
            if RE_ENGINE.match(line) and model:
                stripped = line.replace(" ", "")
                if not RE_OILCODE.match(stripped):
                    if engine is not None and stripped not in _ELECTRIC_GAS:
                        emit(idxs[i])
                        oils = []
                    if stripped not in _ELECTRIC_GAS:
                        engine = stripped
                    else:
                        engine = engine + " " + stripped
                else:
                    oils.extend(RE_OILCODE.findall(stripped))
                continue
        if line == "Oil":  # validity gate (:111-112)
            valid = True

    # trailing flush at end of conversation (:118-119)
    if model and engine and oils:
        emit(idxs[-1] if idxs else 0)
    return rows

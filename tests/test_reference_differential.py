"""DIFFERENTIAL tests: oracle vs the ACTUAL reference code.

The reference's pure functions are imported straight from
``/root/reference`` (side effects stripped, PDF libs stubbed —
see reference_loader.py) and compared against this engine's oracle on
hundreds of fixture-grammar inputs. This is the per-turn text-equality
evidence the north rule asks for, obtained without PDFs: same inputs,
reference code vs oracle code, byte-equal outputs.
"""

import numpy as np
import pytest

from pdf_extractors_ray.oracle import catalog as my_catalog
from pdf_extractors_ray.oracle import census as my_census
from pdf_extractors_ray.oracle import grid as my_grid
from pdf_extractors_ray.oracle import invoice as my_invoice
from pdf_extractors_ray.oracle import layout as my_layout
from pdf_extractors_ray.oracle import persons as my_persons
from pdf_extractors_ray.oracle import table as my_table
from pdf_extractors_ray.sources import transcripts as gen

import os

from reference_loader import REFERENCE_ROOT, load_reference_module

if not os.path.isdir(REFERENCE_ROOT):  # reference absent → skip, don't fail
    pytest.skip("reference repo not available", allow_module_level=True)

ref_persons = load_reference_module("roman-census/persons.py", "ref_persons")
ref_household = load_reference_module("roman-census/household.py", "ref_household")
ref_invoice = load_reference_module("nordic-logistics-invoice/nordic-invoice.py", "ref_invoice")
ref_mobil = load_reference_module("mobil-oil/mobil-oil-extractor.py", "ref_mobil")
ref_ffiec = load_reference_module("us-ffiec-demographic-Info/ffiec-census.py", "ref_ffiec")
ref_knr = load_reference_module("knr-property-mgmt/knr_property.py", "ref_knr")
ref_mancini = load_reference_module("mancini-beverage-invoice/invoice.py", "ref_mancini")


def _member_corpus(n_seeds: int = 60) -> list[str]:
    """Member strings from the fixture grammar + reference-shaped literals."""
    out = []
    for seed in range(n_seeds):
        rng = np.random.RandomState(1000 + seed)
        for k in range(1, 4):
            out.append(gen._gen_member(rng, k, k == 1, 4))
        out.append(gen._gen_slave(rng, 1))
    out += [
        "(1) Harthotes [declarant] s. Marres and Esersythis, public farmer and priest of Tothoes, 55",
        "(2) Taorseus d. Harthotes and Taues, wife of Kronion [no. 1], 35",
        "(3) X s./d. A and B, age lost",
        "(4) Y ?d. A, probably 30",
        "(5) Z s. (or d.?) of Q, 12",
        "(6) W, sister of nos. 2 and 4, 8",
        "(7) V, slave of Kronion, female, 20",
        "(8) U, offspring of Thermouthis, male, 2",
        "(9) T d. A and B, daughter of the declarant, 12, 14",
        "(10) S, wife of Y [no. l], 30",
        "(11) R, divorced wife of K, 30",
        "(12) Aurelius Isidoros [declarant] s. Ptolemaios and Herais, 37",
    ]
    return out


MEMBERS = _member_corpus()


# ---------------------------------------------------------------------------
# roman-census/persons.py — the full extractor bank


@pytest.mark.parametrize("fn_ref,fn_my", [
    (ref_persons.get_name, my_persons.get_name),
    (ref_persons.get_age, my_persons.get_age),
    (ref_persons.get_father, my_persons.get_father),
    (ref_persons.get_mother, my_persons.get_mother),
    (ref_persons.get_spouses, my_persons.get_spouse),
    (ref_persons.get_siblings, my_persons.get_siblings),
    (ref_persons.get_relation_to_declarant, my_persons.get_relation_to_declarant),
    (ref_persons.get_slave_mother, my_persons.get_slave_mother),
    (ref_persons.get_owner, my_persons.get_owner),
    (ref_persons.get_occupation, my_persons.get_occupation),
], ids=["name", "age", "father", "mother", "spouse", "siblings",
        "relation", "slave_mother", "owner", "occupation"])
def test_persons_extractors_match_reference(fn_ref, fn_my):
    for data in MEMBERS:
        assert fn_my(data) == fn_ref(data), data


def test_persons_sex_matches_reference():
    for data in MEMBERS:
        for mtype in ("F", "K", "S"):
            assert my_persons.get_sex(data, mtype) == ref_persons.get_sex(data, mtype), (data, mtype)


def test_persons_grandfathers_match_reference():
    for data in MEMBERS:
        for hid in ("", "117-Ar-2", "131-Ox-1"):
            assert my_persons.get_paternal_grandfather(data, hid) == ref_persons.get_paternal_grand_father(data, hid)
            assert my_persons.get_maternal_grandfather(data, hid) == ref_persons.get_maternal_grand_father(data, hid)


def test_persons_parse_person_matches_reference():
    for mtype in ("F", "K", "S"):
        mine = my_persons.parse_person("200-Ar-1", MEMBERS, mtype)
        ref = ref_persons.parse_person("200-Ar-1", MEMBERS, mtype)
        assert len(mine) == len(ref)
        for m, r in zip(mine, ref):
            for key in r:
                assert m.get(key) == r.get(key), (key, r["data"])


def test_persons_number_reference_matches_reference():
    persons = [{"data": d} for d in MEMBERS]
    for ref_no in range(1, 8):
        assert my_persons.find_number_reference(ref_no, persons) == ref_persons.find_number_reference(ref_no, persons)


def test_persons_full_household_resolution_matches_reference():
    """End-to-end stage B on fixture households: run BOTH resolution
    pipelines (ids, kinship cascade, declarant synthesis) and compare the
    final person rows field-for-field."""
    rng = np.random.RandomState(7)
    for seed in range(20):
        lines = gen._gen_census(np.random.RandomState(2000 + seed), 1.0)
        households = my_census.extract_census_conv(lines, list(range(len(lines))))
        for h in households:
            mine = my_persons.extract_persons_for_household(h)

            ref_rows = []
            for mtype, key in (("F", "name_of_family_members"),
                               ("K", "name_of_non_family_members"),
                               ("S", "slaves")):
                group = ref_persons.parse_person(h["household_number"], list(h[key]), mtype)
                ref_persons.set_personal_ids(h["household_number"], list(h["declarant_id"]),
                                             list(h["declarant_name_parsed"]), group)
                if mtype in ("F", "K"):
                    ref_persons.set_relationship_ids(group)
                if mtype == "F":
                    added = ref_persons.add_declarant_as_person(
                        h["household_number"], h.get("declarant_name"),
                        list(h["declarant_name_parsed"]), list(h["declarant_id"]), group)
                    if added:
                        ref_persons.set_relationship_ids_based_on_declarant(group)
                ref_rows.extend(group)

            assert len(mine) == len(ref_rows), h["household_number"]
            for m, r in zip(mine, ref_rows):
                for key in my_persons.PERSON_COLUMNS:
                    if key == "household_id":
                        continue
                    assert m.get(key) == r.get(key), (key, h["household_number"], r.get("data"))


# ---------------------------------------------------------------------------
# roman-census/household.py — declarant parsing + projections


def _declarant_corpus() -> list[str]:
    out = []
    for seed in range(80):
        rng = np.random.RandomState(3000 + seed)
        lines = gen._gen_census(rng, 1.0)
        out.extend(line.split(":", 1)[1].strip() for line in lines if line.startswith("Declarant:"))
    out += [
        "Not preserved", "Name lost", "[Harthotes s. Marres",
        "Ammonios and Herakles", "Heron, Dioskoros, and Herakles, all three sons of Ptolemaios",
        "Thermouthis and her children Kronion, through their father Pnepheros",
    ]
    return out


def test_household_declarant_parser_matches_reference():
    for line in _declarant_corpus():
        assert my_census.get_parsed_declarants(line) == ref_household.get_parsed_declarants(line), line


def test_household_helpers_match_reference():
    for line in _declarant_corpus():
        assert my_census.get_occupation(line) == ref_household.get_occupation(line)
    for hn in ["117-Ar-6", "131-He-2", "201 Ox 3", "99-Me"]:
        assert my_census.split_household_number(hn) == ref_household.split_household_number(hn)
    for prov in ["Theadelphia (Arsinoite), 22/1/12", "Karanis"]:
        assert my_census.split_provenance(prov) == ref_household.split_provenance(prov)
    for d in ["Broken at top", "broken", "Complete.", None]:
        assert my_census.broken_flag(d) == ref_household.check_discussion_indicates_broken(d)
    items = ["(1) a", "x", "(1) b", "(2) c"]
    assert my_census.split_on_key(items, "(1)") == ref_household.split_on_key(items, "(1)")


def test_household_member_extractor_matches_reference():
    for line in ["Family members: (1) X s. A, 12", "(30) Y", "(31) no", "none here"]:
        assert my_census.get_member(line) == ref_household.get_members(line)


# ---------------------------------------------------------------------------
# nordic invoice — pattern bank


def _fragment_corpus() -> list[str]:
    out = []
    for seed in range(40):
        out.extend(gen._gen_invoice(np.random.RandomState(4000 + seed), 1.0))
    out.append(": 999\nTour No.: 5")
    return out


def test_invoice_extraction_matches_reference(capsys):
    for frag in _fragment_corpus():
        text = ("Order No." + frag) if frag.startswith(":") else frag
        assert my_invoice.extract_fields(text) == ref_invoice.extract_information(text)
    capsys.readouterr()  # swallow the reference's per-field prints


# ---------------------------------------------------------------------------
# mobil catalog — boilerplate bank + state machine


def test_catalog_valid_line_matches_reference():
    lines = []
    for seed in range(20):
        lines.extend(gen._gen_catalog(np.random.RandomState(5000 + seed), 1.0))
    for line in lines:
        assert my_catalog.is_boilerplate_line(line.strip()) == (not ref_mobil.valid_line(line.strip())), line


def test_catalog_state_machine_matches_reference():
    for seed in range(20):
        lines = gen._gen_catalog(np.random.RandomState(6000 + seed), 1.0)
        # reference consumes page objects whose lines start at the banner
        start = next(i for i, t in enumerate(lines) if t.strip() == my_catalog.BANNER)
        stripped = [t.strip() for t in lines[start:]]
        ref_rows = ref_mobil.parse_lines([{"page_number": 0, "lines": stripped}])
        my_rows = my_catalog.extract_catalog_conv(lines, list(range(len(lines))))
        assert len(my_rows) == len(ref_rows), seed
        for m, r in zip(my_rows, ref_rows):
            _page, mfr, year, model, engine, oils = r
            assert m["manufacturer"] == mfr
            assert m["year"] == year
            assert m["model"] == model
            assert m["engine"] == engine
            assert set(m["oils"]) == set(oils)  # ref order is hash-unstable


# ---------------------------------------------------------------------------
# ffiec / knr / mancini


def test_ffiec_binning_matches_reference():
    from collections import OrderedDict

    header = [(25.0, "State Code"), (55.0, "County Code"), (90.0, "Tract Code")]
    ref_ffiec.columns_names_with_coord = OrderedDict(header)
    for x0 in [10.0, 25.0, 26.0, 54.9, 55.0, 89.9, 90.0, 500.0]:
        assert my_layout.bin_column(x0, header) == ref_ffiec.get_column_name(x0)


def test_knr_total_fixup_matches_reference():
    row = ["Total 100.00 50.00", "", "", "", "", "", "", "450.00"]
    ref_row = list(row)
    ref_knr.enrich_data(ref_row)
    assert my_table.fix_merged_total(row) == ref_row


def test_mancini_postprocessing_matches_reference():
    raw = [
        ["QTY", "ITEM", "j", "CODE", "SIZE", "j2", "PRICE", "j3"],
        ["12|", " 4711 ", "x", ";842", "1.5L", "y", "9.99", "z"],
        ["1", "Z", "x", "1", "1.5L", "y", "9.99", "z"],
        ["1", "4712", "x", "1", "TOOLONGSIZE", "y", "9.99", "z"],
        ["7", "88 88", "x", "55;", "750ML", "y", "1.50", "z"],
    ]
    ref_df = ref_mancini.post_processing([list(r) for r in raw])
    import json

    my_rows = my_grid.extract_grid_conv([json.dumps(r) for r in raw], list(range(len(raw))))
    assert len(my_rows) == len(ref_df)
    for m, (_, r) in zip(my_rows, ref_df.iterrows()):
        for i in (0, 1, 3, 4, 6):
            assert m[f"c{i}"] == r[i], (m, dict(r))


def test_household_summary_matches_reference():
    """prepare_first_csv (household.py:234-286) vs summarize_household on
    enriched fixture households."""
    for seed in range(20):
        lines = gen._gen_census(np.random.RandomState(7000 + seed), 1.0)
        households = my_census.extract_census_conv(lines, list(range(len(lines))))
        ref_rows = ref_household.prepare_first_csv(households)
        assert len(ref_rows) == len(households)
        for h, r in zip(households, ref_rows):
            mine = my_census.summarize_household(h)
            for key, val in r.items():
                k = key.replace("declarant_name_", "declarant_name_")
                assert mine.get(k if k in mine else key) == val, (key, h["household_number"])


def test_household_declarant_ids_match_reference():
    for hn, decs in [("117-Ar-6", ["A", "B"]), ("9-Ox-1", []), (None, ["A"])]:
        assert my_census.generate_declarant_ids(hn, decs) == ref_household.generate_unique_id(hn, decs)


def test_catalog_banner_strip_matches_reference():
    for seed in range(10):
        lines = [t.strip() for t in gen._gen_catalog(np.random.RandomState(8000 + seed), 1.0)]
        ref_kept = ref_mobil.remove_duplicate_lines(lines)
        start = next((i for i, t in enumerate(lines) if t == my_catalog.BANNER), len(lines))
        assert ref_kept == lines[start:]


# ---------------------------------------------------------------------------
# FULL-PIPELINE differentials: drive the reference's own page loops with
# faked PDF objects built from our transcript payloads


def test_invoice_full_pipeline_matches_reference(capsys):
    """Reference page loop (nordic-invoice.py:65-100) emulated with its own
    helpers over the joined conversation text vs my conversation fold."""
    for seed in range(25):
        turns = gen._gen_invoice(np.random.RandomState(9000 + seed), 1.0)

        # --- reference side: one OCR "page" = the joined conversation ---
        page_text = "\n".join(turns)
        splitted = page_text.split("Order No.")
        invoice_num = 0
        invoice_date = due_date = customer_number = None
        complete = []
        for index, frag in enumerate(splitted):
            if frag.startswith(":"):
                frag = "Order No." + frag
            extracted = ref_invoice.extract_information(frag)
            if len(extracted) > 0:
                if index == 0:
                    invoice_num = ref_invoice.get(extracted, "Invoice")
                    invoice_date = ref_invoice.get(extracted, "Invoice Date")
                    due_date = ref_invoice.get(extracted, "Due Date")
                    customer_number = ref_invoice.get(extracted, "Customer Number")
                else:
                    row = ref_invoice.initialize_dict("1", invoice_num, invoice_date, due_date, customer_number)
                    row.update(extracted)
                    complete.append(row)
        ref_invoice.post_processing(complete)

        # --- my side: turns are the fragments ---
        mine = my_invoice.extract_invoice_conv(turns, list(range(len(turns))))

        assert len(mine) == len(complete), seed
        for m, r in zip(mine, complete):
            for key in r:
                if key == "Page":
                    continue  # reference: page ordinal; engine: turn_idx
                assert m.get(key) == r.get(key), (key, seed)
    capsys.readouterr()


class _FakeTable:
    def __init__(self, header):
        # fitz table shape: cells[x][0] = column x-coordinate;
        # extract()[0] = header names row (ffiec-census.py:61-77)
        self.col_count = len(header)
        self.cells = [[h["x"]] for h in header]
        self._names = [h["col"] for h in header]

    def extract(self):
        return [self._names]


class _FakeTables(list):
    @property
    def tables(self):
        return self


class _FakePage:
    def __init__(self, payloads):
        self._payloads = payloads  # list of box-lists; one block per payload
        self._header = None

    def get_text(self, kind):
        if kind == "text":
            return ""
        blocks = []
        for boxes in self._payloads:
            spans = [
                {
                    "font": b.get("font"),
                    "text": b.get("text"),
                    "bbox": (b.get("x0"), b.get("y0", 0.0), b.get("x1", 0.0), b.get("y1", 0.0)),
                }
                for b in boxes
            ]
            blocks.append({"lines": [{"spans": spans}]})
        return {"blocks": blocks}

    def find_tables(self):
        return _FakeTables([_FakeTable(self._header)])


class _FakeDoc:
    def __init__(self, pages):
        self.pages = pages
        self.page_count = len(pages)

    def load_page(self, i):
        return self.pages[i]


def test_ffiec_full_pipeline_matches_reference(capsys):
    """Reference extract_info_from_pdf (ffiec-census.py:15-48) driven by a
    faked fitz document built from our layout payloads vs my fold."""
    import json
    from collections import OrderedDict

    for seed in range(10):
        turns = gen._gen_layout(np.random.RandomState(9500 + seed), 1.0)
        payloads = [json.loads(t) for t in turns]
        page = _FakePage([p["boxes"] for p in payloads])
        page._header = payloads[0]["header"]

        ref_ffiec.columns_names_with_coord = OrderedDict()
        ref_ffiec.fitz.open.return_value = _FakeDoc([page])
        ref_rows = ref_ffiec.extract_info_from_pdf("fake.pdf")

        mine = my_layout.extract_layout_conv(turns, list(range(len(turns))))
        assert len(mine) == len(ref_rows), seed
        for m, r in zip(mine, ref_rows):
            for key, val in r.items():
                assert m.get(key) == val, (key, seed)
    capsys.readouterr()


class _FakeKnrTable:
    def __init__(self, rows):
        self.row_count = len(rows)
        self.col_count = len(rows[0]) if rows else 0
        self._rows = [list(r) for r in rows]

    def extract(self):
        return self._rows


class _FakeKnrPage:
    def __init__(self, rows):
        self._rows = rows

    def find_tables(self):
        return _FakeTables([_FakeKnrTable(self._rows)])

    def get_text(self, kind):
        return ""


def test_knr_full_pipeline_matches_reference(capsys):
    """Reference page loop (knr_property.py:15-47) with a faked table vs my
    conversation fold (header + data rows = the conversation's turns)."""
    import json

    for seed in range(10):
        turns = gen._gen_table(np.random.RandomState(9800 + seed), 1.0)
        rows = [json.loads(t) for t in turns]

        ref_knr.column_names = {}
        ref_knr.final_data = []
        ref_knr.fitz.open.return_value = _FakeDoc([_FakeKnrPage(rows)])
        ref_rows = ref_knr.extract_info_from_pdf("fake.pdf")

        mine = my_table.extract_table_conv(turns, list(range(len(turns))))
        assert len(mine) == len(ref_rows), seed
        for m, r in zip(mine, ref_rows):
            for key, val in r.items():
                assert m.get(key) == val, (key, seed)
    capsys.readouterr()


class _FakeTextPage:
    def __init__(self, text):
        self._text = text

    def get_text(self, kind):
        return self._text


def test_census_full_pipeline_matches_reference(capsys):
    """Reference extract_info_from_pdf (household.py:22-143) with a faked
    fitz document vs my household fold. The reference skips the first two
    lines of every page (:38, running page headers), so the fake page text
    carries two dummy header lines before the transcript lines."""
    for seed in range(15):
        lines = gen._gen_census(np.random.RandomState(9900 + seed), 1.0)
        page_text = "PAGE-HEADER-1\nPAGE-HEADER-2\n" + "\n".join(lines)
        ref_household.fitz.open.return_value = _FakeDoc([_FakeTextPage(page_text)])
        ref_raw = ref_household.extract_info_from_pdf("fake.pdf")

        mine = my_census.fold_household_lines(lines)
        assert len(mine) == len(ref_raw), seed
        for m, r in zip(mine, ref_raw):
            assert m == r, (seed, r.get("household_number"))

        # enrichment loop (household.py:408-435) on the reference's records
        for entry in ref_raw:
            entry.update({"declarant_occupation": ref_household.get_occupation(entry.get("declarant_name"))})
            entry.update({"declarant_name_parsed": ref_household.get_parsed_declarants(entry.get("declarant_name"))})
            entry.update({"declarant_id": ref_household.generate_unique_id(
                entry.get("household_number"), entry.get("declarant_name_parsed"))})
            if len(entry.get("name_of_family_members")) == 0 and len(entry.get("slaves")) > 0:
                parts = ref_household.split_on_key(entry.get("slaves"), "(1)")
                if len(parts) >= 3:
                    entry.update({"name_of_family_members": parts[0],
                                  "name_of_non_family_members": parts[1], "slaves": parts[2]})
                elif len(parts) >= 2:
                    entry.update({"name_of_family_members": parts[0], "slaves": parts[1]})
            if "187-Ar-4" in str(entry.get("household_number")):
                parts = ref_household.split_on_key(entry.get("name_of_family_members"), "(1)")
                entry.update({"name_of_family_members": parts[0]})
                entry.update({"name_of_non_family_members": parts[1] if len(parts) > 1 else []})
            if "131-He-2" in str(entry.get("household_number")):
                entry["provenance"] = "Ankyronpolis (Herakleopolite), 133"

        mine_enriched = my_census.extract_census_conv(lines, list(range(len(lines))))
        for m, r in zip(mine_enriched, ref_raw):
            assert m == r, (seed, r.get("household_number"))
    capsys.readouterr()

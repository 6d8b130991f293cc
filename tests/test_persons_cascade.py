"""Deeper branch coverage for the census/persons oracle cascades
(SURVEY.md §2.2 M6-M20, §2.4 J1-J3)."""

from pdf_extractors_ray.oracle import census, persons


def _household(members, declarant="Kronion s. Pnepheros and Taues, farmer, 40",
               dec_parsed=("Kronion",), hid="131-Ox-1", non_kin=(), slaves=()):
    return {
        "household_number": hid,
        "declarant_name": declarant,
        "declarant_name_parsed": list(dec_parsed),
        "declarant_id": [f"{hid}-d{i+1}" for i in range(len(dec_parsed))],
        "name_of_family_members": list(members),
        "name_of_non_family_members": list(non_kin),
        "slaves": list(slaves),
    }


def test_sex_variants():
    assert persons.get_sex("(1) X s./d. A and B, 5", "F") == "male or female"
    assert persons.get_sex("(1) X ?d. A, 5", "F") == "possible female"
    assert persons.get_sex("(1) X ?s. A, 5", "F") == "possible male"
    assert persons.get_sex("(1) X s. (or d.?) of A, 5", "F") == "male or female"
    assert persons.get_sex("(1) X, female slave, 20", "S") == "female"


def test_age_or_join_and_probably():
    assert persons.get_age("(1) X d. A and B, 12, 14") == "12, 14"
    assert persons.get_age("(2) Y s. A, probably 30") == "probably 30"


def test_relation_daughter_of_declarant():
    data = "(2) T d. K and E, daughter of the declarant, 12"
    assert persons.get_relation_to_declarant(data) == "daughter"


def test_spouse_negative_lookbehind():
    assert persons.get_spouse("(2) T, divorced wife of K, 30") is None
    assert persons.get_spouse("(2) T, wife of K, 30") == "K"


def test_kinship_nos_and_reference():
    h = _household(
        [
            "(1) Kronion [declarant] s. Pnepheros and Taues, farmer, 40",
            "(2) A s. Kronion and T, son of Kronion [no. 1], 10",
            "(3) B d. Kronion and T, sister of nos. 2 and 4, 8",
            "(4) C s. Kronion and T, 6",
        ]
    )
    out = persons.extract_persons_for_household(h)
    by_name = {p["id"]: p for p in out}
    declarant = out[0]
    son = out[1]
    # no.1 reference resolves son -> declarant's child
    assert son["id"] in declarant["children"] or son["father"] == declarant["id"]


def test_question_mark_reference():
    h = _household(
        [
            "(1) Kronion [declarant] s. Pnepheros and Taues, farmer, 40",
            "(2) T d. P and E, wife of Kronion [no. 1]?, 35",
        ]
    )
    out = persons.extract_persons_for_household(h)
    declarant, wife = out[0], out[1]
    assert wife["spouse"] == declarant["id"] + "?"
    assert declarant["spouse"] == wife["id"] + "?"


def test_declarant_synthesis_when_no_self():
    h = _household(
        ["(1) A d. Kronion and T, daughter of the declarant, 12"],
        declarant="Herakles s. Ammonios and Taues, weaver, 50",
        dec_parsed=("Herakles",),
    )
    out = persons.extract_persons_for_household(h)
    # declarant row synthesized and inserted first (persons.py:731-769)
    assert out[0]["relation_to_declarant"] == "self"
    assert out[0]["name"] == "Herakles"
    assert out[0]["id"].endswith("-d1")
    # defaulting pass links the daughter to the synthesized declarant
    assert out[0]["children"] and out[1]["father"] == out[0]["id"]


def test_declarant_parser_special_phrases():
    line = "Heron, Dioskoros, and Herakles, all three sons of Ptolemaios"
    assert census.get_parsed_declarants(line) == ["Heron", "Dioskoros", "Herakles"]
    line2 = "Tasoucharion, and Thermouthis both sons of Ammonios"
    got = census.get_parsed_declarants(line2)
    assert "Thermouthis" in got


def test_split_on_key_repair():
    h = {
        "household_number": "200-Ar-1",
        "declarant_name": None,
        "declarant_name_parsed": [],
        "declarant_id": [],
        "name_of_family_members": [],
        "name_of_non_family_members": [],
        "slaves": ["(1) A, 10", "(2) B, 12", "(1) C, slave of A, 20"],
    }
    census.enrich_households([h])
    assert h["name_of_family_members"] == ["(1) A, 10", "(2) B, 12"]
    assert h["slaves"] == ["(1) C, slave of A, 20"]


def test_occupation_gazetteers_differ():
    # 'donkey driver' only in household.py's list; 'scribe' only in persons.py's
    assert census.get_occupation("X, donkey driver, 30") == "donkey driver"
    assert persons.get_occupation("X, donkey driver, 30") == ""
    assert persons.get_occupation("X, scribe, 30") == "scribe"
    assert census.get_occupation("X, scribe, 30") == ""


def test_131_patch_and_broken_flag():
    hs = census.fold_household_lines(
        ["HOUSEHOLD NO.: 131-He-2", "Declarant: Not preserved", "Discussion: broken throughout"]
    )
    census.enrich_households(hs)
    assert hs[0]["provenance"] == "Ankyronpolis (Herakleopolite), 133"
    assert census.broken_flag(hs[0]["discussion"]) == "Yes"

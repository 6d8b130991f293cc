"""Census household assembly (roman-census stage A).

Reimplements the semantics of ``roman-census/household.py``:

- the anchor-keyed line fold (``:22-143``): dispatch on line anchors
  (``HOUSEHOLD NO.:``, ``Source:``, ``Prov., Date:``, ``Declarant:``,
  ``Family members:``, ``Free non-kin:``, ``Slaves:``, ``Verif./photo:``,
  ``Discussion:``), numbered-member extraction (``:181-197``),
  continuation-line accumulation keyed by ``last_read_variable``
  (``:97-135``), boilerplate skip (``:95-96``),
- enrichment (``:408-435``): occupation gazetteer (``:145-168``), declarant
  parsing (``:288-393``), declarant ids (``:172-179``), mis-bucketed
  member-list repair via ``split_on_key`` (``:209-219``) and the hard-coded
  ``187-Ar-4`` / ``131-He-2`` record patches (``:427-435`` — part of the
  observable semantics, kept deliberately),
- the household summary projection (``prepare_first_csv``, ``:234-286``)
  with its key splitters (``:221-232``), 5-column declarant widening,
  member counts and brokenness flag (``:199-207``).

One conversation = one stretch of the catalogue; households never span
conversations (the synthesizer guarantees this, mirroring how the reference
never splits a household across its two source PDFs).

Documented divergence: the reference skips the first two lines of every
PDF page (``household.py:38`` ``lines[2:]`` — running page headers).
Transcript turns carry no page headers, so every line is consumed; the
anchor grammar is otherwise identical (verified function-by-function by
tests/test_reference_differential.py).
"""

from __future__ import annotations

import re

_RE_MEMBER = re.compile(r"\((1[0-9]|2[0-9]|30|[1-9])\).*")

BOILERPLATE_PREFIXES = ("Cambridge Books", "https://", "Catalogue of census declarations")

# household.py:146-152 — gazetteer (differs slightly from persons.py's)
OCCUPATIONS = [
    "public farmer and priest", "public farmer", "farmer", "priest", "mason",
    "discharged solder", "workman", "idiotes", "former gym- nasiarch", "metallikos",
    "discharged veteran", "hyperetes", "hierotek- ton", "tax-exempt hieronikes",
    "nekrotaphos", "woolwasher", "linenweaver", "sitometrosakkophoros",
    "former exegetai", "member of the hiera synodos",
    "councillor", "taurotrophos", "fisherman", "weaver", "donkey driver",
    "goldsmith", "spinner", "salaried linen-weaver", "lathe turner",
]

HOUSEHOLD_KEYS = [
    "household_number", "source", "provenance", "declarant_name",
    "declarant_name_parsed", "declarant_id", "name_of_family_members",
    "name_of_non_family_members", "slaves", "declarant_occupation",
    "verif_photo", "discussion",
]
_LIST_KEYS = ("slaves", "name_of_family_members", "name_of_non_family_members",
              "declarant_name_parsed", "declarant_id")

SUMMARY_COLUMNS = [
    "household_number_year", "household_number_location", "household_number_order",
    "source", "provenance", "provenance_place", "provenance_year",
    "declarant_name_1", "declarant_name_2", "declarant_name_3",
    "declarant_name_4", "declarant_name_5", "declarant_ids",
    "declarant_occupation", "number_of_family_members",
    "number_of_non_family_members", "number_of_slaves", "verif_photo",
    "discussion_text", "discussion_indicates_substantive_record_brokenness",
]


def _new_household() -> dict:
    return {k: ([] if k in _LIST_KEYS else None) for k in HOUSEHOLD_KEYS}


def get_member(line: str) -> str | None:
    """Numbered-member substring ``(N)...`` for N in 1..30 (:186-192)."""
    m = _RE_MEMBER.search(line)
    return m.group(0) if m else None


def _accumulate(bucket: list, line: str) -> None:
    """Continuation line: new member if anchored, else append to the last
    entry with a leading space (household.py:97-130)."""
    member = get_member(line)
    if member:
        bucket.append(member)
    elif not bucket:
        bucket.append(" " + line)
    else:
        bucket[-1] += " " + line


def fold_household_lines(texts: list[str], turn_idxs=None) -> list[dict]:
    """The ordered anchor fold (household.py:22-143) over one conversation."""
    data: list[dict] = []
    cur = _new_household()
    last_var = ""
    counter = 0
    for raw in texts:
        for line in raw.split("\n"):
            if line == "":
                continue
            if line.startswith("HOUSEHOLD NO.:"):
                if counter != 0:
                    data.append(cur)
                    cur = _new_household()
                    last_var = ""
                cur["household_number"] = line.split(":")[1].strip()
                counter += 1
            elif line.startswith("Source:") or line[1:].startswith("Source:") or line.startswith("*Source:"):
                cur["source"] = line.split("Source:")[1].strip()
            elif line.startswith("Prov., Date:"):
                cur["provenance"] = line.split(":")[1].strip()
            elif line.startswith("Declarant:") or line.startswith("Declarants:"):
                last_var = "declarant_name"
                cur["declarant_name"] = line.split(":")[1].strip()
            elif line.startswith(("Family members:", "Family members, free non-kin:",
                                  "Family members, free non-kin, slaves:")):
                last_var = "name_of_family_members"
                member = get_member(line)
                if member:
                    cur["name_of_family_members"].append(member)
            elif line.startswith(("Free non-kin, slaves:", "Free non-kin:")):
                last_var = "name_of_non_family_members"
                member = get_member(line)
                if member:
                    cur["name_of_non_family_members"].append(member)
                else:
                    value = line[line.find(":") + 1 :].strip()
                    if value and not value.startswith("None") and value not in ("No names survive", "No name survive"):
                        cur["name_of_non_family_members"].append(value)
            elif line.startswith("Slaves:"):
                last_var = "slaves"
                member = get_member(line)
                if member:
                    cur["slaves"].append(member)
                else:
                    value = line[line.find("Slaves:") + len("Slaves:") :].strip()
                    if value and value != "None":
                        cur["slaves"].append(value)
            elif line.startswith("Verif./photo:"):
                last_var = "verif_photo"
                cur["verif_photo"] = line.split("Verif./photo:")[1].strip()
            elif line.startswith("Discussion:"):
                last_var = "Discussion"
                cur["discussion"] = line.split(":")[1].strip()
            elif line.startswith(BOILERPLATE_PREFIXES):
                continue
            else:
                if last_var in ("name_of_family_members", "name_of_non_family_members", "slaves"):
                    _accumulate(cur[last_var], line)
                elif last_var == "declarant_name":
                    cur["declarant_name"] += " " + line
                elif last_var == "Discussion":
                    cur["discussion"] += " " + line
    data.append(cur)  # trailing household (:138-141)
    return data


def get_occupation(line: str | None, occupations=None) -> str:
    """First gazetteer match; 'priest of X' suffix capture (:145-168)."""
    if line is None:
        return ""
    for occ in occupations or OCCUPATIONS:
        if occ in line:
            ret = occ
            if "priest" in occ:
                parts = line.split("priest of ")
                if len(parts) == 2:
                    ret += " of "
                    ret += parts[1].split(",")[0] if "," in parts[1] else parts[1]
            return ret
    return ""


_RE_DECL = re.compile(r"^([A-Za-z\s.]+?)(?=\s+s\.)|([A-Za-z\s.]+?)(?=\s+d\.)|([A-Za-z]+(?: and [A-Za-z]+)*)\b")
_RE_SD_WORD = re.compile(r"(?<!\()\b(\w+)\b (?=[sd]\.)")


def get_parsed_declarants(line: str | None) -> list[str]:
    """Declarant-name parser (household.py:288-393) — segment on ';',
    3-alternative regex, ~10 hard-coded phrase splitters, final and/comma
    explode. Control flow mirrored bug-for-bug (e.g. a non-matching segment
    re-appends the previous segment's match)."""
    declarants: list[str] = []
    if line is None:
        return declarants
    if line.startswith("Name") or line.startswith("Not"):
        return [line]
    if line.startswith("["):
        line = line[1:]

    matches = None  # deliberately persists across segments (:307-319)
    for segment in line.split(";"):
        segment = segment.strip()
        if segment.lower().startswith("and "):
            segment = segment[4:].strip()
        m = _RE_DECL.match(segment)
        if m:
            matches = m.group(1) or m.group(2) or m.group(3)
        if matches:
            if "d." in matches:
                matches = matches.split("d.")[0]
            declarants.append(matches)

    if not declarants:  # fallbacks (:323-329)
        if "s." in line:
            declarants.append(line.split("s.")[0])
        if "d." in line:
            declarants.append(line.split("d.")[0])
        elif "]tion" in line:
            declarants.append(line)

    # hard-coded phrase splitters (:331-373)
    if "(s. Lykos)" in line or "s. Petos," in line:
        declarants = [w for w in _RE_SD_WORD.findall(line)]
    elif "archos s. Apollonios" in line:
        declarants = [line.split("s.")[0].strip()]
    elif " and his children " in line:
        declarants.append(line.split(" and his children ")[1])
    elif ", all three sons of " in line:
        head = line.split(", all three sons of ")[0]
        first, second = head.split(", and")
        declarants = [first.split(",")[0].strip(), first.split(",")[1].strip(), second.strip()]
    elif "(nios?)" in line:
        declarants = [line.split(", sons of ")[0]]
    elif "alias" in line and " sons of " in line:
        if "," in line:
            parts = line.split(",")
            declarants = [
                parts[0],
                parts[2].split("s.")[0].split("and ")[1],
                parts[3].split(" both sons of")[0].split("and ")[1],
                parts[3].split(" both sons of")[0].split("and ")[2],
            ]
        else:
            declarants = [line.split(" sons of ")[0]]
    elif ", and " in line and " both sons of " in line:
        declarants.append(line.split(" both sons of ")[0].split(", and ")[1])
    elif " his sister, and " in line:
        declarants.append(line.split(" his sister, and ")[0].split(", ")[1])
        declarants.append(line.split(" his sister, and ")[1].split(" daughters of")[0])
    elif " and her children " in line:
        children = line.split(" and her children ")[1].split(", through their father ")
        declarants.append(children[0])
        declarants.append(children[1])

    # final and/comma explode (:375-391)
    exploded: list[str] = []
    for item in declarants:
        if "and" in item or "," in item:
            if "and" in item:
                exploded.extend(item.split(" and "))
            else:
                parts = item.split(",")
                if parts[1].strip() != "":
                    exploded.extend(item.split(","))
                else:
                    exploded.append(parts[0])
        else:
            exploded.append(item)
    return [s.strip() for s in exploded]


def generate_declarant_ids(household_number, declarants: list[str]) -> list[str]:
    """``<household>-dN`` per declarant (household.py:172-179)."""
    if not household_number or not declarants:
        return []
    return [f"{household_number}-d{i + 1}" for i in range(len(declarants))]


def split_on_key(items: list[str], key: str) -> list[list[str]]:
    """Split a list into sublists at entries starting with ``key`` (:209-219)."""
    idxs = [i for i, it in enumerate(items) if it.startswith(key)]
    idxs.append(len(items))
    return [items[idxs[i] : idxs[i + 1]] for i in range(len(idxs) - 1)]


def enrich_households(households: list[dict]) -> list[dict]:
    """Post-fold enrichment loop (household.py:408-435)."""
    for entry in households:
        entry["declarant_occupation"] = get_occupation(entry.get("declarant_name"))
        entry["declarant_name_parsed"] = get_parsed_declarants(entry.get("declarant_name"))
        entry["declarant_id"] = generate_declarant_ids(entry.get("household_number"), entry["declarant_name_parsed"])
        if len(entry["name_of_family_members"]) == 0 and len(entry["slaves"]) > 0:
            parts = split_on_key(entry["slaves"], "(1)")
            if len(parts) >= 3:
                entry["name_of_family_members"] = parts[0]
                entry["name_of_non_family_members"] = parts[1]
                entry["slaves"] = parts[2]
            elif len(parts) >= 2:
                entry["name_of_family_members"] = parts[0]
                entry["slaves"] = parts[1]
        if "187-Ar-4" in str(entry.get("household_number")):
            parts = split_on_key(entry["name_of_family_members"], "(1)")
            entry["name_of_family_members"] = parts[0]
            entry["name_of_non_family_members"] = parts[1] if len(parts) > 1 else []
        if "131-He-2" in str(entry.get("household_number")):
            entry["provenance"] = "Ankyronpolis (Herakleopolite), 133"
    return households


def split_household_number(household_number: str) -> list[str]:
    parts = household_number.strip().replace(" ", "-").split("-")
    if len(parts) == 2:
        parts.append("")
    return parts


def split_provenance(provenance: str) -> list[str]:
    parts = provenance.split(",")
    if len(parts) == 1:
        parts.append("")
    return parts


def broken_flag(discussion: str | None) -> str:
    if discussion and ("Broken" in discussion or "broken" in discussion):
        return "Yes"
    return "No"


def summarize_household(entry: dict) -> dict:
    """One summary row (prepare_first_csv, household.py:234-286)."""
    out: dict = {}
    hn = split_household_number(entry["household_number"])
    out["household_number_year"], out["household_number_location"], out["household_number_order"] = hn[0], hn[1], hn[2]
    out["source"] = entry.get("source")
    out["provenance"] = entry.get("provenance")
    prov = split_provenance(entry.get("provenance") or "")
    out["provenance_place"], out["provenance_year"] = prov[0], prov[1]
    decs = entry.get("declarant_name_parsed") or []
    for i in range(5):
        out[f"declarant_name_{i + 1}"] = decs[i] if len(decs) > i else ""
    out["declarant_ids"] = entry.get("declarant_id")
    out["declarant_occupation"] = entry.get("declarant_occupation")
    out["number_of_family_members"] = len(entry["name_of_family_members"])
    out["number_of_non_family_members"] = len(entry["name_of_non_family_members"])
    out["number_of_slaves"] = len(entry["slaves"])
    out["verif_photo"] = entry.get("verif_photo")
    out["discussion_text"] = entry.get("discussion")
    out["discussion_indicates_substantive_record_brokenness"] = broken_flag(entry.get("discussion"))
    return out


def extract_census_conv(texts: list[str], turn_idxs=None) -> list[dict]:
    """Full stage-A fold for one conversation → enriched household records."""
    return enrich_households(fold_household_lines(texts))

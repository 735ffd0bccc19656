"""Record-level match checks (SURVEY.md §2.4 M2/M4/M5/M6, §2.2 F1).

Pure functions over a record's tag dict and an entity's name dict, pinned by
`/root/reference/tests/test_match.py:567-571,809-970,594-714,717-806` and
re-expressing `/root/reference/matcher/match.py:765-1077`.

Fixture-driven fix vs the reference *code*: the reference derives extra
"<key> strip operator" names for every name containing the operator, which
double-reports matches when the operator is a *prefix* (its own tests
test_match_operator_at_start_of_name / test_check_for_match are red on
that).  Here the derived key is only added when the operator appears
mid-name; prefix occurrences are handled by the in-loop retry, matching the
fixtures.
"""

from __future__ import annotations

import re
from collections import defaultdict
from collections.abc import Collection, Mapping

from ..text.normalize import (
    normalize_name,
    normalize_url,
    normalized_name_match,
    normalized_name_startswith,
)
from .cascade import BOTH_TRIMMED, INITIALS, WIKIDATA_TRIMMED, initials_decision, match_names, name_prefix_remainder

TagDict = dict[str, str]

# OSM keys that contain "name" but are not display names (match.py:74-82).
NON_NAME_KEYS = frozenset(
    {
        "tiger:name_base",
        "name:right",
        "name:left",
        "gnis:county_name",
        "openGeoDB:name",
        "addr:street:name",
        "name:source",
    }
)

# "in <city>" forms per language for addr:city ending enrichment
# (match.py:1016-1026).
_CITY_PREPOSITIONS = ("in", "w", "à", "en", "em", "v", "i", "a")

_RE_NUMBER_START = re.compile(
    r"^(?:House at )?(?:(?:Number|No)s?\.? )?(\d[-\d]*,? .*$)"
)
_RE_UK_POSTCODE = re.compile(r"^[a-z][a-z]\d+[a-z]?$", re.I)

_ROAD_ABBR = {
    "avenue": "ave",
    "street": "st",
    "road": "rd",
    "boulevard": "blvd",
    "drive": "dr",
    "lane": "ln",
    "square": "sq",
}
_DIRECTION_ABBR = {
    "north": "n",
    "south": "s",
    "east": "e",
    "west": "w",
    "northwest": "nw",
    "northeast": "ne",
    "southwest": "sw",
    "southeast": "se",
}
_ABBR = {**_ROAD_ABBR, **_DIRECTION_ABBR}
_RE_ABBR = re.compile(r"\b(" + "|".join(_ABBR) + r")\b", re.I)
_RE_ADDRESS_COMMON_END = re.compile("^(.+)(" + "|".join(_ABBR) + "|plaza)$", re.I)
_RE_RANGE_START = re.compile(r"\d+ ?([-–+&]|and) ?$")


def display_names(tags: TagDict) -> TagDict:
    """Name-bearing tags of a record (F1; match.py:956-962 semantics)."""
    return {
        k: v
        for k, v in tags.items()
        if ("name" in k and k not in NON_NAME_KEYS) or k == "operator"
    }


def has_address(tags: TagDict) -> bool:
    """Record carries an address (match.py:765-767)."""
    return "addr:housenumber" in tags or "addr:full" in tags


def url_value_match(value: str, candidates: Collection[str]) -> bool:
    """URL equality modulo scheme/www/trailing slash (match.py:770-773)."""
    key = normalize_url(value)
    return any(key == normalize_url(c) for c in candidates)


def identifier_match(
    tags: TagDict, identifiers: Mapping[str, list[tuple[Collection[str], str]]]
) -> bool:
    """Any identifier tag value equals a claimed identifier (M4;
    match.py:776-797 semantics): exact, space-stripped, URL-normalised for
    websites, and int-normalised for digit strings."""
    for key, claim_groups in (identifiers or {}).items():
        value = tags.get(key)
        if not value:
            continue
        for claimed, label in claim_groups:
            pool = set(claimed) | {c.replace(" ", "") for c in claimed if " " in c}
            if value in pool:
                return True
            if " " in value and value.replace(" ", "") in pool:
                return True
            if label == "website" and url_value_match(value, pool):
                return True
            if value.isdigit() and any(
                c.isdigit() and int(c) == int(value) for c in pool
            ):
                return True
    return False


def address_in_extract(tags: TagDict, extract: str) -> bool:
    """The entity's text extract mentions the record's address (M6;
    match.py:803-826 semantics), vetoing range starts like "27–29 X"."""
    if not extract or not has_address(tags):
        return False

    def _search(address: str) -> bool:
        pattern = _RE_ABBR.sub(
            lambda m: "(" + m.group(1) + "|" + _ABBR[m.group(1).lower()] + r"\.?)",
            re.escape(address),
        )
        m = re.search(r"\b" + pattern, extract, re.I)
        if not m:
            m = re.search(r"\b" + pattern, extract.replace(",", ""), re.I)
        return not _RE_RANGE_START.search(extract[: m.start()]) if m else False

    if "addr:housenumber" in tags and "addr:street" in tags:
        if _search(tags["addr:housenumber"] + " " + tags["addr:street"]):
            return True
    return "addr:full" in tags and _search(tags["addr:full"])


def _name_has_housenumber(name: str) -> bool:
    """A non-leading token starts with a digit (match.py:829-835)."""
    if not name or name[0].isdigit():
        return False
    terms = name.split()
    return len(terms) > 1 and any(t[0].isdigit() for t in terms[1:])


def address_match(
    tags: TagDict, entity_names: Collection[str]
) -> bool | None:
    """Tri-state address decision (M5; match.py:838-953 semantics).

    True: an entity name is the record's address.  False: entity names are
    addresses but none agree.  None: no address signal either way.
    """
    if not has_address(tags):
        return None

    number_start = {
        m.group(1)
        for m in (
            _RE_NUMBER_START.match(n)
            for n in entity_names
            if not n.lower().endswith(" building")
        )
        if m
    }
    number_end = {n for n in entity_names if _name_has_housenumber(n)}
    if not number_start and not number_end:
        return None

    full_parts = ("street", "housenumber", "postcode", "city")
    if all("addr:" + p in tags for p in full_parts):
        a = {p: tags["addr:" + p] for p in full_parts}
        european = f'{a["street"]} {a["housenumber"]}, {a["postcode"]} {a["city"]}'
        if european in entity_names:
            return True

    decomma = [n[: n.rfind(",")] for n in set(number_start) if "," in n]
    number_start.update(n for n in decomma if not n.isdigit())
    norm_number_start = {normalize_name(n) for n in number_start}

    postcode = tags.get("addr:postcode", "").lower() or None
    city = tags.get("addr:city")

    if "addr:housenumber" in tags and "addr:street" in tags:
        osm_address = tags["addr:housenumber"] + " " + tags["addr:street"]
        norm_osm_address = normalize_name(osm_address)
        if any(normalized_name_match(osm_address, n) for n in number_start):
            return True

        if city:
            street_in = f" street in {city}"
            for n in number_start:
                if n.endswith(street_in) and normalized_name_match(
                    osm_address, n[: -len(street_in)]
                ):
                    return True

        reversed_address = tags["addr:street"] + " " + tags["addr:housenumber"]
        if any(normalized_name_match(reversed_address, n) for n in number_end):
            return True

        if city:
            with_city = " ".join(
                tags[f"addr:{p}"] for p in ("street", "housenumber", "city")
            )
            if any(normalized_name_match(with_city, n) for n in number_end):
                return True

        for n in number_start:
            head, _, postcode_start = n.rpartition(" ")
            if postcode and not postcode.startswith(postcode_start.lower()):
                continue
            if _RE_UK_POSTCODE.match(postcode_start) and normalize_name(head) == norm_osm_address:
                return True

        if any(
            n.startswith(norm_osm_address) or norm_osm_address.startswith(n)
            for n in norm_number_start
        ):
            return None  # partial overlap: undecided

        m = _RE_ADDRESS_COMMON_END.match(norm_osm_address)
        if m and any(n.startswith(m.group(1)) for n in norm_number_start):
            return None

    if "addr:full" in tags:
        full = tags["addr:full"]
        norm_full = normalize_name(full)
        if any(normalized_name_startswith(full, n) for n in number_start):
            return True
        for n in number_start:
            head, _, postcode_start = n.rpartition(" ")
            if _RE_UK_POSTCODE.match(postcode_start) and normalize_name(head) == norm_full:
                return True

    if not number_start:
        return None

    # a name-level agreement relaxes the address requirement
    record_name = tags.get("name")
    agrees = record_name is not None and any(n == record_name for n in number_start)
    return None if agrees else False


def _initials_shadowed(
    candidate: str, entity_names: Mapping[str, object]
) -> bool:
    """The initials also expand to a different entity name (match.py:965-970)."""
    return any(
        other != candidate and initials_decision(candidate, other)
        for other in entity_names
    )


def _without_operator(name: str, operator: str) -> str:
    """Delete the first occurrence of the operator (match.py:973-976)."""
    start = name.lower().find(operator.lower())
    return name[:start] + name[start + len(operator):]


MatchMap = dict[str, list[tuple[str, object, object]]]


def check_for_match(
    tags: TagDict,
    entity_names: Mapping[str, object],
    endings: Collection[str] | None = None,
    place_names: Collection[str] | None = None,
    trim_house: bool = True,
) -> MatchMap:
    """Cross-product name scoring for one (record, entity) pair (M2;
    match.py:982-1077 semantics).  Returns ``{record_key: [(kind,
    entity_name, sources), ...]}``."""
    trim = set(endings or [])
    if trim_house:
        trim.add("house")

    names = display_names(tags)
    operator = names["operator"].lower() if "operator" in names else None
    if not names or not entity_names:
        return {}

    if operator:
        for osm_key, full in list(names.items()):
            lowered = full.lower()
            pos = lowered.find(operator)
            if pos <= 0:
                continue  # prefix case handled by the in-loop retry
            stripped = _without_operator(full, operator)
            if any(c.isalpha() for c in stripped):
                names[osm_key + " strip operator"] = stripped

    if "addr:city" in tags:
        city = tags["addr:city"].lower()
        trim.add(city)
        trim.update(f"{prep} {city}" for prep in _CITY_PREPOSITIONS)

    found: defaultdict[str, list[tuple[str, object, object]]] = defaultdict(list)
    misses: set[tuple[str, str]] = set()
    for entity_name, sources in entity_names.items():
        for osm_key, record_name in names.items():
            if (record_name, entity_name) in misses:
                continue
            m = match_names(record_name, entity_name, trim, place_names=place_names)
            if not m and operator and record_name.lower().startswith(operator):
                m = match_names(
                    record_name[len(operator):].rstrip(),
                    entity_name,
                    trim,
                    place_names=place_names,
                )
                if m and m.kind in (BOTH_TRIMMED, WIKIDATA_TRIMMED):
                    continue
            if not m:
                misses.add((record_name, entity_name))
                continue
            # both-sides-trimmed against an operator tag is too weak
            if m.kind == BOTH_TRIMMED and osm_key == "operator":
                continue
            if m.kind == INITIALS and _initials_shadowed(entity_name, entity_names):
                continue
            found[osm_key].append((m.kind, entity_name, sources))
    if found:
        return dict(found)

    # second pass: record name = "<entity name> (<other entity name>)"
    for entity_name, sources in entity_names.items():
        for osm_key, record_name in names.items():
            remainder = name_prefix_remainder(record_name, entity_name)
            if not remainder:
                continue
            for other_name in entity_names:
                if other_name == entity_name:
                    continue
                if match_names(remainder, other_name, place_names=place_names):
                    found[osm_key].append(("prefix", entity_name, sources))
                    break
    return dict(found)


def _image_only_match(entries: list) -> bool:
    """matcher.py:1505-1506: a key's matches are image-derived only."""
    if len(entries) != 1:
        return False
    sources = entries[0][2]
    try:
        return len(sources) == 1 and sources[0][0] == "image"
    except (TypeError, IndexError):
        return False


def proper_name_match_flags(found: Mapping[str, list]) -> tuple[bool, bool]:
    """G2 per-candidate predicates (matcher.py:1509-1539) from the M2
    match map: (has a proper ``name``/``name:*`` match that is not
    image-only, matched via addr:housename/operator).  The second flag is
    prefer_proper_name_match's others_ok condition — a candidate that is
    neither proper nor housename/operator blocks the group shrink."""
    found = found or {}
    proper = ("name" in found and not _image_only_match(found["name"])) or any(
        key.startswith("name:") and not _image_only_match(entries)
        for key, entries in found.items()
    )
    fallback = "addr:housename" in found or "operator" in found
    return proper, fallback


def get_all_matches(
    tags: TagDict,
    entity_names: Mapping[str, object],
    endings: Collection[str] | None = None,
) -> list[tuple[str, str, str, str]]:
    """M3 diagnostic variant (match.py:1080-1107 semantics): every
    (record name, entity name) pair that matches, flat — no per-key
    grouping, no operator strips, no city-ending enrichment, no
    initials/operator vetoes.  Returns [(osm_key, osm_name, entity_name,
    kind)] in entity-outer iteration order like the reference."""
    names = display_names(tags)
    matches = []
    for entity_name in entity_names:
        for osm_key, record_name in names.items():
            m = match_names(record_name, entity_name, endings)
            if m:
                matches.append((osm_key, record_name, entity_name, m.kind))
    return matches

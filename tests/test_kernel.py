"""Kernel unit tests — the F1 anchor (SURVEY.md §5).

Parametrised over the labeled fixtures ported from
/root/reference/tests/test_match.py; plus the normalisation unit vectors and
the helper-function contracts.
"""

from __future__ import annotations

import pytest

from osm_wikidata_spark.kernel import cascade, records
from osm_wikidata_spark.text import normalize, numwords
from tests.fixtures import (
    ADDRESS_CASES,
    CHECK_CASES,
    EXTRACT_CASES,
    MAIN_CASES,
    PAIR_CASES,
)


# --- normalisation vocabulary (test_match.py:15-24,27-28,87-96) ---

def test_tidy_name():
    assert normalize.tidy_name("no change") == "no change"
    assert normalize.tidy_name("saint andrew's") == "st andrew"
    assert normalize.tidy_name(" ? ") == "?"
    assert normalize.tidy_name(" s ") == "s"
    assert normalize.tidy_name("Թի Դի Գարդեն".lower()) == "t`i di garden"
    assert normalize.tidy_name("four crosses") == "four cros"
    assert normalize.tidy_name("four crosses, powys") == "four cros, powy"


def test_drop_article():
    assert normalize.drop_article("the old shop") == "old shop"


def test_normalize_name():
    assert normalize.normalize_name("TEST TEST") == "testtest"
    assert normalize.normalize_name("testtest") == "testtest"


def test_no_alpha():
    assert not normalize.no_alpha("abc")
    assert not normalize.no_alpha("123abc")
    assert normalize.no_alpha("123")
    assert normalize.no_alpha("")


def test_split_on_upper():
    assert list(normalize.split_on_upper("Phillips Chapel CME Church")) == [
        "Phillips", "Chapel", "C", "M", "E", "Church",
    ]


def test_numwords():
    assert numwords.cardinal(42) == "forty-two"
    assert numwords.cardinal(10) == "ten"
    assert numwords.cardinal(149) == "one hundred and forty-nine"
    assert numwords.ordinal(3) == "third"
    assert numwords.ordinal(2) == "second"
    assert numwords.ordinal(149) == "one hundred and forty-ninth"
    assert numwords.ordinal(20) == "twentieth"
    assert normalize.ordinal_number_to_word("3rd Avenue") == "third Avenue"


# --- helper contracts ---

def test_prefix_name_match():
    assert cascade.name_prefix_remainder(
        "National Museum of Mathematics (MoMath)", "National Museum of Mathematics"
    ) == "(MoMath)"
    assert cascade.name_prefix_remainder(
        "NationalMuseumOfMathematics (MoMath)", "National Museum of Mathematics"
    ) == "(MoMath)"


def test_match_with_words_removed():
    same = "no change"
    assert cascade.removed_words_decision(same, same, ["test"])
    assert not cascade.removed_words_decision(same, same, [])
    assert cascade.removed_words_decision("norwich", "norwich bus station", ["bus station"])
    assert cascade.removed_words_decision("Vif", "gare de Vif", ["gare de"])
    m = cascade.removed_words_decision("oxmoor mall", "oxmoor center", ["mall", "center"])
    assert m.kind == "both_trimmed"
    assert not cascade.removed_words_decision("hall", "post office", ["hall", "post office"])


def test_initials_match():
    assert cascade.initials_decision("TIAT", "This Is A Test")
    assert cascade.initials_decision("TIAT station", "This Is A Test", endings=["station"])
    assert cascade.initials_decision("T.I.A.T.", "This Is A Test")
    assert cascade.initials_decision("TIAT", "This is a test")
    assert not cascade.initials_decision("bad", "Bad Match Here")
    assert not cascade.initials_decision("TO", "to short")
    assert cascade.initials_decision("ТГПУ", "Томский государственный педагогический университет")
    assert cascade.initials_decision("CRM", "Centre de Recerca Matemàtica")


def test_name_containing_initials():
    assert cascade.names_align_on_initials(
        "Phillips Chapel CME Church", " Phillips Chapel Christian Methodist Episcopal Church"
    )
    assert cascade.names_align_on_initials(
        "Phillips Chapel C.M.E. Church", " Phillips Chapel Christian Methodist Episcopal Church"
    )
    assert cascade.names_align_on_initials(
        "Phillips Chapel CME Church", " PC Christian Methodist Episcopal Church"
    )
    assert not cascade.names_align_on_initials("(St John's College)", "LMBC")
    assert not cascade.names_align_on_initials("1", "1-й общественный совет")
    assert not cascade.names_align_on_initials(
        "Manhattan Community Board 1", "Manhattan Community Board 11"
    )
    assert cascade.names_align_on_initials("ČSOB centrála", "ČSOB")
    assert not cascade.names_align_on_initials("ČSOB Centrála", "ČSOB")


def test_drop_initials():
    assert cascade.without_initials("RGC – Rainbow Grocery Coop") == "Rainbow Grocery Coop"
    assert cascade.without_initials("R.G.C. – Rainbow Grocery Coop") == "Rainbow Grocery Coop"
    assert cascade.without_initials("Rainbow Grocery Coop RGC") == "Rainbow Grocery Coop"
    assert cascade.without_initials("Rainbow Grocery Coop (RGC)") == "Rainbow Grocery Coop"


# --- the decision cascade over labeled pairs ---

@pytest.mark.parametrize(
    "osm,wd,endings,place_names,expect",
    PAIR_CASES,
    ids=[f"{i}:{c[0][:24]}~{c[1][:24]}" for i, c in enumerate(PAIR_CASES)],
)
def test_pair_decisions(osm, wd, endings, place_names, expect):
    got = cascade.match_names(osm, wd, endings=endings, place_names=place_names)
    if expect is None:
        assert got is None
    elif expect == "*":
        assert got is not None
    else:
        assert got is not None and got.kind == expect


@pytest.mark.parametrize(
    "osm,wd,endings,expect",
    MAIN_CASES,
    ids=[f"{i}:{c[0][:24]}~{c[1][:24]}" for i, c in enumerate(MAIN_CASES)],
)
def test_main_decisions(osm, wd, endings, expect):
    got = cascade.match_names_main(osm, wd, set(endings) if endings else None)
    if expect is None:
        assert got is None
    else:
        assert got is not None


# --- record-level checks ---

def test_get_names():
    assert records.display_names({}) == {}
    assert records.display_names({"name": "test"}) == {"name": "test"}
    assert records.display_names({"operator": "test"}) == {"operator": "test"}
    assert records.display_names({"name:left": "test"}) == {}


def test_has_address():
    assert not records.has_address({})
    assert records.has_address({"addr:full": "1 Station Road"})
    assert records.has_address({"addr:housenumber": "1"})


def test_check_identifiers():
    assert records.identifier_match({}, {}) is False
    identifiers = {"iata": [(("PDX",), "IATA airport code")]}
    assert records.identifier_match({"iata": "PDX"}, identifiers)
    assert not records.identifier_match({"iata": "LAX"}, identifiers)
    assert not records.identifier_match({}, identifiers)
    tag = "seamark:light:reference"
    assert records.identifier_match({tag: "D 123"}, {tag: [(("D123",), "Admiralty number")]})
    url = "http://test.org"
    identifiers = {"website": [((url,), "website")]}
    assert records.identifier_match({"website": url}, identifiers)
    assert records.identifier_match({"website": "https://www.test.org"}, identifiers)


@pytest.mark.parametrize("case", CHECK_CASES, ids=[c["id"] for c in CHECK_CASES])
def test_check_for_match(case):
    got = records.check_for_match(
        case["tags"],
        case["names"],
        endings=case.get("endings"),
        place_names=case.get("place_names"),
    )
    assert got == case["expect"]


@pytest.mark.parametrize(
    "tags,names,expect",
    ADDRESS_CASES,
    ids=[f"addr{i}" for i in range(len(ADDRESS_CASES))],
)
def test_address_match(tags, names, expect):
    got = records.address_match(tags, names)
    if expect == "not-false":
        assert got is not False
    elif expect == "falsy":
        assert not got
    elif expect is None:
        assert got is None
    else:
        assert got is expect


@pytest.mark.parametrize(
    "tags,extract,expect",
    EXTRACT_CASES,
    ids=[f"ext{i}" for i in range(len(EXTRACT_CASES))],
)
def test_address_in_extract(tags, extract, expect):
    assert records.address_in_extract(tags, extract) is expect


def test_is_in_range():
    assert normalize.is_in_range("27-29 Queen Square", "29 Queen Square")
    assert not normalize.is_in_range("27-29 Queen Square", "31 Queen Square")
    assert normalize.is_in_range("135 and 137 2nd Avenue", "137 2nd Avenue")


def test_xxh64_ref_matches_spark(spark):
    """tests/xxh64_ref.py (the pure-Python xxHash64 behind the generated
    dedup oracles) must agree with F.xxhash64 on every path the dedup
    operators use: string, int-literal + string chain, multi-long chain."""
    from pyspark.sql import functions as F

    from tests.xxh64_ref import xxhash64

    import random

    rng = random.Random(20260817)
    alphabet = "abcdefghij ABC0123 é漢字ß"
    strings = ["", "a", "word shingle text", "x" * 32, "héllo wörld ünïcode",
               "the quick brown fox jumps over the lazy dog again and again"]
    # randomized lengths straddling the 8/4-byte tail steps and the 32-byte
    # stripe boundary of the xxHash64 core loop
    strings += [
        "".join(rng.choice(alphabet) for _ in range(n))
        for n in list(range(1, 40)) + [63, 64, 65, 100]
        for _ in range(3)
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string").select(
        "s",
        F.xxhash64("s").alias("h1"),
        F.xxhash64(F.lit(7), "s").alias("h2"),
    )
    for r in df.collect():
        assert xxhash64(r["s"]) == r["h1"]
        assert xxhash64(("int", 7), r["s"]) == r["h2"]
    longs = [(1, -2, 3**20, -(5**25))]
    row = (
        spark.createDataFrame(longs, "a long, b long, c long, d long")
        .select(F.xxhash64("a", "b", "c", "d").alias("h"))
        .collect()[0]
    )
    assert xxhash64(*longs[0]) == row["h"]

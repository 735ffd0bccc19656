"""Labeled fixtures ported from the reference's test suite.

Every row cites its origin in ``/root/reference/tests/test_match.py`` (line
numbers as of the 2026-08-07 snapshot).  These are the F1 anchor demanded by
BASELINE.json: the Spark scoring stage must reproduce these decisions.

``PAIR_CASES`` rows: (osm_name, wd_name, endings, place_names, expect)
where ``expect`` is None (must not match), "*" (must match, any kind), or a
specific decision kind.
"""

from __future__ import annotations

PAIR_CASES: list[tuple[str, str, list[str] | None, list[str] | None, str | None]] = [
    # test_name_match, lines 213-344
    ("", "", None, None, None),
    ("test", "test", None, None, "good"),
    ("the old shop", "old shop", None, None, "*"),
    ("test", "", None, None, None),
    ("", "test", None, None, None),
    ("test", "test.", None, None, "*"),
    ("test.", "test", None, None, "*"),
    ("test", ".", None, None, None),
    (".", "test", None, None, None),
    ("aaa", "bbb", None, None, None),
    ("aaa", "the ", None, None, None),
    ("aaa-bbb", "aaa bbb", None, None, "*"),
    ("the bull", "bull public house", ["public house"], None, "*"),
    ("TIAT", "This Is A Test", None, None, "*"),
    ("John Smith", "Statue of John Smith", None, None, "trim"),
    ("John Smith", "Tomb of John Smith", None, None, "trim"),
    ("Lake Test", "Test", ["lake"], None, "*"),
    ("Test", "Lake Test", ["lake"], None, "*"),
    ("Test", "Test, Washington, DC", None, None, "*"),
    ("aaa bbb", "bbb aaa", None, None, "*"),
    ("Vif", "gare de Vif", ["gare"], None, "*"),
    ("Vif", "station Vif", ["station"], None, "*"),
    ("Sliabh Liag", "Sliabh a Liag", None, None, "*"),
    ("Beulah", "Beulah, Powys", None, None, "*"),
    ("Four Crosses", "Four Crosses, Powys", None, None, "*"),
    ("The Ship", "'The Ship', Derriford", None, None, "*"),
    ("Place Bellecour", " La Place Bellecour", None, None, "*"),
    ("Lamott", "La Mott, Pennsylvania", None, None, "*"),
    ("Ті-Ді гарден", "Թի Դի Գարդեն", None, None, "*"),
    ("Maria-Hilf-Kirche", "Mariahilfkirche, Munich", None, None, "*"),
    ("Kunkelspass", "Кункелспас", None, None, "*"),
    ("Bethanien-Kirche", "Bethanienkirche, Berlin", None, None, "*"),
    ("Tricketts Cross", "Trickett's Cross, Dorset", None, None, "*"),
    ("Кастелец", "Кастелець", None, None, "*"),
    ("Church and 18th Street", "Church Street & 18th Street", None, None, "*"),
    ("Church and 18th Street", "Church Street & 18th Street", ["test"], None, "*"),
    ("Boulder Railroad Depot (Historic)", "Boulder Railroad Depot", None, None, "*"),
    ("Times Furnishing", "Times Furnishing Company Building", None, None, "*"),
    ("Bailiffscourt Hotel And Country Club", "Bailiffscourt Hotel", None, None, "*"),
    ("St Peter & St Paul", "St Peter and St Paul, Bromley", None, None, "*"),
    (
        "New York Skyports Incorporated Seaplane Base",
        "New York Skyports Inc. Seaplane Base",
        None, None, "*",
    ),
    ("Disneyland Pacific Hotel; Pacific Hotel", "Disneyland Pacific Hotel", None, None, "*"),
    (
        "Leeds Bradford International", "Leeds Bradford International Airport",
        ["airport", "international airport"], None, "*",
    ),
    ("Bresso", "Aeroporto di Bresso", ["aeroporto"], None, "*"),
    ("Rainbow Grocery Coop", "Rainbow Grocery Cooperative", None, None, "*"),
    ("Kirkwood Inn", "Kirkwood's", ["inn"], None, "*"),
    ("ESCOLA DE NAUTICA DE BARCELONA", "Escola de Nàutica de Barcelona", None, None, "good"),
    ("Lombard Buildings", "Lombard Building", ["building"], None, "good"),
    ("Boxers", "The Boxers", None, None, "*"),
    ("The Landers", "Landers Theatre", ["theatre"], None, "*"),
    (
        "Main Street Station", "Richmond Main Street Station",
        None, ["Richmond City", "Virginia"], "*",
    ),
    ("Manor Buildings", "Manor House Buildings", ["house"], None, "*"),
    ("site of Pegwell Lodge", "Pegwell Lodge", None, None, "*"),
    ("City of Birmingham Symphony Orchestra", "CBSO Centre", None, None, "*"),
    ("Wabasca Indian Reserve #166", "Wabasca 166", ["Indian reserve"], None, "*"),
    # test_reorder, lines 75-84
    (
        "Renaissance Center Tower 300", "Renaissance Center 300 Tower",
        ["tower"], None, "*",
    ),
    ("Renaissance Center Tower 300", "Renaissance Center 300 Tower", None, None, "*"),
    # test_name_match_numbers, lines 151-162
    ("Manhattan Community Board 1", "Manhattan Community Board 1", None, None, "*"),
    ("Manhattan Community Board 11", "Manhattan Community Board 1", None, None, None),
    ("Manhattan Community Board 1", "Manhattan Community Board 11", None, None, None),
    # test_name_with_dashes, lines 187-196
    ("Hôpital Saint-François-d'Assise", "Hôpital Saint-François d'Assise", None, None, "*"),
    ("Walton on the Hill", "Walton-on-the-Hill", None, None, "*"),
    # test_church_names, lines 347-412
    ("St John's Church", "St John's Church And Attached Railings", None, None, "*"),
    ("Church building", "Church", None, None, "*"),
    ("Church", "Church building", None, None, "*"),
    ("St. Michael's Church", "Church Of St Michael", ["church", "church of"], None, "*"),
    (
        "Saint Vitus Catholic Church", "St. Vitus's Church, Cleveland",
        ["church", "church of", "catholic church", "rc church"],
        ["Cleveland", "Cuyahoga County", "Ohio"], "*",
    ),
    (
        "St. Paul's Roman Catholic Church", "St. Paul's Catholic Church",
        None, None, "*",
    ),
    ("St Peter", "Saint Peter", None, None, "*"),
    ("Test Roman Catholic church", "Test RC church", None, None, "*"),
    (
        "Church of Ss Peter and Paul", "St Peter and St Paul's Church",
        ["church", "church of"], None, "*",
    ),
    (
        "Michaelstow Church", "Michaelstow DSC 8243",
        ["church", "church of"], None, "*",
    ),
    (
        "Saint Edmund and Saint George", "Church of St Edmund and George",
        ["church", "church of", "st"], None, "*",
    ),
    (
        "Parish Church of St Mary", "St Mary the Virgin",
        ["parish church", "church"], None, "*",
    ),
    (
        "St John the Evangelist parish church", "Parish Church of St John, the Evangelist",
        ["parish church", "parish", "church"], None, "*",
    ),
    (
        "St Mary and St Edmund", "Church of St Edmund and St Mary",
        ["parish church", "parish", "church", "church of"], None, "*",
    ),
    # test_number_in_name, lines 415-425
    ("Lake Number Ten", "Lake No. 10", None, None, "*"),
    ("Lake No. 10", "Lake Number Ten", None, None, "*"),
    ("Test forty two", "Test 42", None, None, "*"),
    ("Test 42", "Test forty two", None, None, "*"),
    # test_ignore_apostrophe_s_in_match, lines 439-443
    ("Augustine Steward House", "Augustine Steward's House", None, None, "good"),
    # test_match_with_missing_house_number, line 452
    ("1-3 Rectory Cottages", "Rectory Cottages", None, None, "*"),
    # test_at_symbol_match, lines 455-459
    ("HEB Center @ Cedar Park", "H-E-B Center at Cedar Park", None, None, "*"),
    ("H-E-B Center at Cedar Park", "HEB Center @ Cedar Park", None, None, "*"),
    # test_street_address, lines 462-467
    ("17 Mill Lane", "1, Mill Lane", None, None, None),
    ("24 Hillhead Street", "2, 4 Hillhead Street", None, None, None),
    ("110 Livingston", "110 Livingston Street", None, None, "*"),
    ("Livingston", "Livingston Street", None, None, None),
    # test_name_starts_with_the_old, line 471
    ("The Old Rectory", "The Rectory", None, None, "*"),
    # test_strict_stable_name_match, lines 482-485
    ("Nazeing Park", "Stable At Nazeing Park", ["stable"], None, None),
    # test_name_match_trim_both, lines 488-493
    ("Oxmoor Mall", "Oxmoor Center", ["mall", "center"], None, "both_trimmed"),
    ("Castle House", "The Castle Inn", ["house", "inn"], None, "both_trimmed"),
    # test_name_match_initials_then_name, lines 514-517
    ("RGC – Rainbow Grocery Coop", "Rainbow Grocery Coop", None, None, "*"),
    # test_name_match_trim_to_empty, lines 520-527
    ("Hall", "Post Office", ["hall", "post office"], None, None),
    # test_match_name_abbreviation, lines 530-541
    ("Bishop Justus CofE School ", "Bishop Justus Church of England School", None, None, "*"),
    ("Bishop Justus CofE School ", "Bishop Justus CE School", None, None, "*"),
    (
        "Mullard Radio Astronomy Observatory (MRAO)", "Mullard Radio Astronomy Observatory",
        None, None, "*",
    ),
    # test_strip_words, lines 544-553
    ("Rio de la Tetta", "Rio Tetta", None, None, "*"),
    ("Holy Trinity Church", "Church Of The Holy Trinity", ["church"], None, "*"),
    # test_match_with_place_names, lines 1016-1022
    (
        "Hungarian house", "Hungarian House of New York",
        None, ["Manhattan", "New York City", "New York", "United States of America"], "*",
    ),
    # test_no_trim_s_on_single_term_name, lines 1025-1029
    ("Boots", "The Boot Inn", ["inn"], None, None),
    # test_strip_place_name, lines 1032-1036
    ("Danmarks ambassade", "Danmarks ambassade i Oslo", None, ["Oslo"], "*"),
    # test_name_match_dash_and_both_trim, lines 1072-1075
    ("Sint Pieters Museum", "Museum Sint-Pieters", ["museum"], None, "*"),
    # test_name_match_church, lines 1078-1081
    ("St Andrew", "St Andrew's Church", ["church"], None, "*"),
]

# (osm, wd, endings) rows for match_names_main only (no retry wrappers)
MAIN_CASES: list[tuple[str, str, list[str] | None, str | None]] = [
    # test_russian_doesnt_match_number, line 200
    ("1", "1-й общественный совет", None, None),
    # test_ordinal_number_name_match, lines 203-210
    ("3rd Avenue–149th Street", "3rd Avenue – 149th Street", None, "*"),
    ("3rd Avenue–149th Street", "Third Avenue – 149th Street", None, "*"),
    # test_number_bad_match, lines 446-448
    ("1 & 2", "12, Downside", None, None),
    ("5.", "5, High Street", None, None),
    # test_match_german_church, lines 428-436
    ("Johannes der Täufer", "St. Johann der Täufer", ["st", "kirche"], "*"),
]

# check_for_match golden dicts (test_check_for_match lines 809-970,
# test_name_match_numbers lines 168-179, operator tests lines 993-1013)
CHECK_CASES: list[dict] = [
    {
        "id": "empty",
        "tags": {},
        "names": {},
        "expect": {},
    },
    {
        "id": "simple-good-two-keys",
        "tags": {"addr:city": "Rome", "name": "test", "alt_name": "test"},
        "names": {"test": [("label", "en")]},
        "expect": {
            "alt_name": [("good", "test", [("label", "en")])],
            "name": [("good", "test", [("label", "en")])],
        },
    },
    {
        "id": "initials-shadowed-by-other-name",
        "tags": {"name": "Burgers and Cupcakes"},
        "names": {
            "Baryshnikov Arts Center": [("label", "en")],
            "BAC": [("extract", "en")],
        },
        "expect": {},
    },
    {
        "id": "prefix-second-name",
        "tags": {"name": "National Museum of Mathematics (MoMath)"},
        "names": {
            "National Museum of Mathematics": [("label", "en")],
            "Momath": [("alias", "en")],
            "Museum of Mathematics": [("alias", "en")],
        },
        "expect": {
            "name": [("prefix", "National Museum of Mathematics", [("label", "en")])],
        },
    },
    {
        "id": "lombard-buildings",
        "tags": {"building:levels": "6", "name": "Lombard Buildings", "building": "yes"},
        "names": {
            "Lombard Building": [("label", "en"), ("sitelink", "enwiki"), ("extract", "enwiki")],
        },
        "endings": ["building"],
        "expect": {
            "name": [
                (
                    "good",
                    "Lombard Building",
                    [("label", "en"), ("sitelink", "enwiki"), ("extract", "enwiki")],
                )
            ]
        },
    },
    {
        "id": "housename-both-trimmed",
        "tags": {
            "name": "Westland London",
            "shop": "furniture",
            "building": "yes",
            "addr:street": "Leonard Street",
            "addr:postcode": "EC2A 4QX",
            "addr:housename": "St. Michael's Church",
        },
        "names": {"Church Of St Michael": [("label", "en")]},
        "endings": ["church", "church of"],
        "expect": {
            "addr:housename": [("both_trimmed", "Church Of St Michael", [("label", "en")])]
        },
    },
    {
        "id": "st-vitus-place-names",
        "tags": {
            "denomination": "roman_catholic",
            "name": "Saint Vitus Catholic Church",
            "amenity": "place_of_worship",
            "religion": "christian",
        },
        "names": {"St. Vitus's Church, Cleveland": [("label", "en")]},
        "endings": ["church", "church of", "catholic church", "rc church"],
        "place_names": ["Cleveland", "Cuyahoga County", "Ohio"],
        "expect": {
            "name": [("both_trimmed", "St. Vitus's Church, Cleveland", [("label", "en")])]
        },
    },
    {
        "id": "samson-and-lion",
        "tags": {
            "addr:city": "Birmingham",
            "addr:housenumber": "42",
            "addr:postcode": "B9 5QF",
            "addr:street": "Yardley Green Road",
            "amenity": "place_of_worship",
            "building": "yes",
            "heritage": "2",
            "heritage:operator": "Historic England",
            "listed_status": "Grade II",
            "name": "Masjid Noor-Us-Sunnah",
            "previous_name": "Samson & Lion",
            "previous_use": "pub",
            "religion": "muslim",
        },
        "names": {"Samson And Lion Public House": [("label", "en")]},
        "endings": ["public house"],
        "expect": {
            "previous_name": [
                ("wikidata_trimmed", "Samson And Lion Public House", [("label", "en")])
            ]
        },
    },
    {
        "id": "stop24",
        "tags": {
            "area": "yes",
            "highway": "services",
            "name": "Stop24 Folkestone Services",
            "operator": "Stop24",
        },
        "names": {
            "Folkestone services": [("sitelink", "enwiki")],
            "Stop 24 services": [("label", "en"), ("extract", "enwiki")],
        },
        "endings": ["services"],
        "place_names": ["Folkestone", "Kent"],
        "expect": {
            "operator": [
                ("wikidata_trimmed", "Stop 24 services", [("label", "en"), ("extract", "enwiki")])
            ],
            "name": [
                ("good", "Folkestone services", [("sitelink", "enwiki")]),
                ("good", "Stop 24 services", [("label", "en"), ("extract", "enwiki")]),
            ],
        },
    },
    {
        "id": "manhattan-board-11-no-match",
        "tags": {"name": "Manhattan Community Board 11"},
        "names": {
            "1-й общественный совет": [("label", "ru")],
            "Manhattan Community Board 1": [
                ("label", "en"), ("sitelink", "enwiki"), ("extract", "enwiki"),
            ],
        },
        "expect": {},
    },
    {
        "id": "gordano-operator-prefix",
        "tags": {
            "highway": "services",
            "landuse": "commercial",
            "name": "Welcome Break Gordano Services",
            "operator": "Welcome Break",
        },
        "names": {"Gordano services": [("label", "en")]},
        "expect": {"name": [("good", "Gordano services", [("label", "en")])]},
    },
    {
        "id": "citizens-bank-no-match",
        "tags": {"name": "Citizens Bank (Roslindale)", "operator": "Citizens Bank"},
        "names": {"Roslindale Theatre": [("label", "en")]},
        "endings": ["theatre"],
        "expect": {},
    },
]

# address tri-state fixtures (test_check_name_matches_address lines 594-714,
# test_embassy_match lines 1056-1069); expect: True / False / None
ADDRESS_CASES: list[tuple[dict, list[str], object]] = [
    ({}, [], None),
    ({"addr:housenumber": "12", "addr:street": "Station Road"}, ["12 Station Road"], True),
    ({"addr:housenumber": "12", "addr:street": "Station Road"}, ["12, Station Road"], True),
    ({"addr:housenumber": "12", "addr:street": "Station Road"}, ["Number 12 Station Road"], True),
    ({"addr:housenumber": "12-14", "addr:street": "Station Road"}, ["Nos 12-14 Station Road"], True),
    ({"addr:housenumber": "12-14", "addr:street": "Station Road"}, ["Station Road"], None),
    # reference asserts only falsity here (line 607)
    ({"addr:housenumber": "24", "addr:street": "Hillhead Street"}, ["2, 4 Hillhead Street"], "falsy"),
    ({"addr:full": "12 Station Road"}, ["12 Station Road"], True),
    ({"addr:full": "Station Road"}, ["12 Station Road"], False),
    (
        {
            "addr:street": "Krakowskie Przedmieście",
            "addr:housenumber": "66",
            "addr:postcode": "00-322",
            "name": "Centralna Biblioteka Rolnicza",
        },
        ["66 Krakowskie Przedmieście Street in Warsaw"],
        "not-false",
    ),
    (
        {
            "name": "100 East Wisconsin",
            "addr:state": "WI",
            "addr:street": "East Wisconsin Avenue",
            "addr:city": "Milwaukee",
            "addr:postcode": "53202",
            "addr:housenumber": "100",
        },
        ["100 East Wisconsin"],
        "not-false",
    ),
    (
        {
            "name": "1000 Second Avenue",
            "addr:housenumber": "1000",
            "addr:street": "2nd Avenue",
            "addr:city": "Seattle",
            "addr:postcode": "98104",
        },
        ["1000 Second Avenue"],
        "not-false",
    ),
    (
        {
            "name": "1300 Lafayette East Cooperative",
            "addr:housenumber": "1300",
            "addr:street": "Lafayette Street East",
            "addr:city": "Detroit",
        },
        ["1300 Lafayette East Cooperative"],
        "not-false",
    ),
    (
        {
            "addr:city": "Kraków",
            "addr:country": "PL",
            "addr:housenumber": "3",
            "addr:postcode": "31-134",
            "addr:street": "Basztowa",
            "building": "apartments",
        },
        ["3 Basztowa street in Kraków"],
        True,
    ),
    (
        {
            "addr:city": "Kraków",
            "addr:country": "PL",
            "addr:housenumber": "3",
            "addr:postcode": "31-134",
            "addr:street": "Basztowa",
            "building": "apartments",
        },
        ["4 Basztowa street in Kraków"],
        False,
    ),
    # postcode fixtures, lines 673-714
    (
        {"addr:housenumber": "12", "addr:street": "Buckingham Street"},
        ["12, Buckingham Street Wc2"],
        True,
    ),
    (
        {
            "addr:housenumber": "12",
            "addr:street": "Buckingham Street",
            "addr:postcode": "WC2N 6DF",
        },
        ["12, Buckingham Street Wc2"],
        True,
    ),
    (
        {
            "addr:housenumber": "12",
            "addr:street": "Buckingham Street",
            "addr:postcode": "EC1X 1AA",
        },
        ["12, Buckingham Street Wc2"],
        "falsy",  # reference asserts only falsity (line 692)
    ),
    ({"addr:full": "12 Buckingham Street"}, ["12, Buckingham Street Wc2"], True),
    (
        {
            "name": "510 Marquette",
            "addr:housenumber": "510",
            "addr:street": "Marquette Avenue South",
        },
        ["510 Marquette Building"],
        "not-false",
    ),
    (
        {
            "addr:street": "Poydras Street",
            "name": "Eni Building",
            "building": "yes",
            "addr:housenumber": "1250",
            "height": "104",
            "wikidata": "Q4548391",
        },
        ["1250 Poydras Plaza", "Mobil Building", "Eni Building"],
        "not-false",
    ),
    (
        {
            "name": "Consulate General of Switzerland in San Francisco",
            "amenity": "embassy",
            "country": "CH",
            "addr:city": "San Francisco",
            "addr:state": "CA",
            "addr:street": "Montgomery Street",
            "addr:postcode": "94104",
            "addr:housenumber": "456",
        },
        ["456 Montgomery Street Suite #2100"],
        "not-false",
    ),
]

# extract fixtures (test_check_for_address_in_extract lines 717-806)
EXTRACT_CASES: list[tuple[dict, str, bool]] = [
    (
        {"addr:street": "West 43rd Street", "addr:housenumber": "4"},
        "Aeolian Hall was a concert hall in midtown Manhattan in New York City, "
        "located on the third floor of 29-33 West 42nd Street (also 34 West 43rd "
        "Street, from the other side) across the street from Bryant Park.",
        False,
    ),
    (
        {"addr:street": "Station Road", "addr:housenumber": "10"},
        "Test House, located at 10 Station Road is a test.",
        True,
    ),
    (
        {
            "addr:city": "Las Vegas",
            "addr:street": "East Tropicana Avenue",
            "addr:postcode": "89119",
            "addr:housenumber": "1610",
        },
        "The Pinball Hall of Fame is a museum for pinball machines that opened in "
        "Paradise, Nevada in January 2006. It is located at 1610 E Tropicana Ave.",
        True,
    ),
    (
        {
            "name": "Old Stone House",
            "tourism": "attraction",
            "building": "yes",
            "historic": "house",
            "addr:city": "Washington",
            "addr:state": "DC",
            "addr:street": "M Street Northwest",
            "addr:country": "US",
            "addr:housenumber": "3051",
        },
        "Built in 1765, Old Stone House is located at 3051 M Street, Northwest in "
        "the Georgetown neighborhood.",
        True,
    ),
    (
        {
            "addr:housenumber": "1264",
            "addr:street": "Wisconsin Avenue Northwest",
            "amenity": "pub",
            "name": "Billy Martin's Tavern",
        },
        "Martin's is located at 1264 Wisconsin Avenue, NW in the Georgetown "
        "neighborhood of Washington D.C.",
        True,
    ),
    (
        {
            "height": "15.3",
            "building": "yes",
            "addr:street": "2nd Avenue",
            "addr:postcode": "10003",
            "addr:housenumber": "137",
        },
        "two adjoining historic buildings located at 135 and 137 2nd Avenue in the "
        "East Village neighborhood of Manhattan",
        False,
    ),
    (
        {"addr:street": "Queen Square", "addr:housenumber": "29"},
        "The Sailors Refuge is an historic house situated at 27–29 Queen Square, "
        "Bristol, England.",
        False,
    ),
]

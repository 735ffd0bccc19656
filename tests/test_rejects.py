"""Reject-reason chain tests (V1-V6), mirroring check_item_candidate
(matcher.py:995-1135) and the reference's pinned reject strings
(tests/test_matcher.py:1230-1263)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_wikidata_spark.operators import rejects

PAIR_SCHEMA = (
    "pair_id string, osm_tags map<string,string>, item_tags array<string>,"
    " categories array<string>, instanceof array<string>, dist double,"
    " identifier_match boolean, address_match boolean, name_match boolean,"
    " name_match_detail array<struct<osm_key string, match_type string>>,"
    " matching_tags array<string>"
)


def _rejects(spark, rows):
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    return {
        r["pair_id"]: r["reject"] for r in rejects.candidate_rejects(df).collect()
    }


def _row(pair_id, *, osm_tags=None, item_tags=(), categories=(), instanceof=(),
         dist=None, idm=False, adm=None, nm=False, detail=None, mt=()):
    return (
        pair_id, osm_tags or {}, list(item_tags), list(categories),
        list(instanceof), dist, idm, adm, nm, detail, list(mt),
    )


def test_bus_stop_reject_reference_case(spark):
    """tests/test_matcher.py:1230-1263 — a generic public transport tag must
    not make a bus stop a station."""
    got = _rejects(spark, [
        _row(
            "finchley",
            osm_tags={
                "bus": "yes",
                "highway": "bus_stop",
                "name": "Finchley Road Station",
                "public_transport": "platform",
            },
            item_tags=["public_transport=platform", "railway=historic_station"],
            instanceof=["Q55488"],
            nm=True,
            detail=[("name", "good")],
            mt=["public_transport=platform"],
        )
    ])
    assert got["finchley"] == "nearby match OSM bus stop matching non-bus stop"


def test_station_house_too_far(spark):
    got = _rejects(spark, [
        _row(
            "far-house",
            osm_tags={"building": "house", "name": "Victoria Station"},
            instanceof=["Q55488"],
            dist=80.0,
            nm=True,
            detail=[("name", "good")],
            mt=[],
        ),
        # within 50 m -> no V3 reject (falls through; name match accepted)
        _row(
            "near-house",
            osm_tags={"building": "house", "name": "Victoria Station"},
            instanceof=["Q55488"],
            dist=30.0,
            nm=True,
            detail=[("name", "good")],
            mt=["railway=station"],
        ),
        # identifier match disables the guard
        _row(
            "id-house",
            osm_tags={"building": "house", "name": "Victoria Station"},
            instanceof=["Q55488"],
            dist=80.0,
            idm=True,
            nm=True,
            detail=[("name", "good")],
            mt=["railway=station"],
        ),
    ])
    assert got["far-house"] == "station shouldn't match a distant house"
    assert got["near-house"] is None
    assert got["id-house"] is None


def test_basic_chain_order(spark):
    got = _rejects(spark, [
        _row(
            "historic",
            osm_tags={"building": "yes"},
            categories=["Historic districts in Foo"],
            nm=True, detail=[("name", "good")], mt=["building"],
        ),
        _row(
            "city",
            osm_tags={"admin_level": "10", "name": "Foo"},
            categories=["Cities in Bar"],
            nm=True, detail=[("name", "good")], mt=[],
        ),
        _row("addr-differ", osm_tags={"name": "X"}, adm=False, nm=True,
             detail=[("name", "good")], mt=[]),
        _row("no-match", osm_tags={"name": "X"}),
        _row(
            "road",
            osm_tags={"name": "X"},
            instanceof=["Q34442"],
            nm=True, detail=[("name", "good")], mt=[],
        ),
        _row(
            "peak",
            osm_tags={"name": "X"},
            instanceof=["Q46831"],
            dist=150.0,
            nm=True, detail=[("name", "good")], mt=["natural=peak"],
        ),
        _row(
            "ok",
            osm_tags={"name": "X"},
            nm=True, detail=[("name", "good")], mt=["amenity=school"],
        ),
    ])
    assert got["historic"] == "historic district shouldn't match building"
    assert got["city"] == "bad city match"
    assert got["addr-differ"] == "OSM and Wikidata addresses differ"
    assert got["no-match"] == "no match"
    assert got["road"] == "nearby road match"
    assert got["peak"] == "mountain range shouldn't match peak"
    assert got["ok"] is None


def test_building_only_rejects(spark):
    got = _rejects(spark, [
        # school vs restaurant by address
        _row(
            "school-restaurant",
            osm_tags={"amenity": "restaurant"},
            item_tags=["amenity=school"],
            adm=True,
            mt=["building"],
        ),
        # non-station by address
        _row(
            "station-by-address",
            osm_tags={"building": "train_station"},
            adm=True,
            mt=["building"],
        ),
        # bad match (castle vs station) via is_bad_match
        _row(
            "castle-station",
            osm_tags={"railway": "station", "name": "Foo Castle"},
            item_tags=["historic=castle"],
            nm=True,
            detail=[("name", "good")],
            mt=["building=yes"],
        ),
        # weak name matches only -> bad building match
        _row(
            "weak-names",
            osm_tags={"building": "yes", "name": "Foo"},
            nm=True,
            detail=[("name", "both_trimmed")],
            mt=["building"],
        ),
        # station rule: wikidata_trimmed counts as WEAK for station items
        # (matcher.py:392-393 — "X" vs "X railway station" alone is not
        # enough to claim a building), so this IS a bad building match
        _row(
            "station-trimmed",
            osm_tags={"building": "yes", "name": "Foo Station"},
            instanceof=["Q55488"],
            nm=True,
            detail=[("name", "wikidata_trimmed")],
            mt=["building"],
        ),
        # ...but for a NON-station item the same detail is good evidence
        _row(
            "nonstation-trimmed",
            osm_tags={"building": "yes", "name": "Foo"},
            nm=True,
            detail=[("name", "wikidata_trimmed")],
            mt=["building"],
        ),
        # stadium vs restaurant / supermarket
        _row(
            "stadium-restaurant",
            osm_tags={"amenity": "restaurant", "name": "Foo"},
            instanceof=["Q483110"],
            nm=True,
            detail=[("name", "good")],
            mt=["building"],
        ),
        _row(
            "stadium-supermarket",
            osm_tags={"shop": "supermarket", "name": "Foo"},
            instanceof=["Q483110"],
            nm=True,
            detail=[("name", "good")],
            mt=["building"],
        ),
    ])
    assert got["school-restaurant"] == "Wikidata school shouldn't match OSM restaurant"
    assert got["station-by-address"] == "non-station shouldn't match station by address"
    assert got["castle-station"] == "bad match"
    assert got["weak-names"] == "bad building match"
    assert got["station-trimmed"] == "bad building match"
    assert got["nonstation-trimmed"] is None
    assert got["stadium-restaurant"] == "stadium shouldn't match restaurant"
    assert got["stadium-supermarket"] == "stadium shouldn't match supermarket"


def test_pre_candidate_guards(spark):
    rows = [
        ("townland", {"locality": "townland", "name": "X"}, [], [], [], None,
         False, None, True, None, []),
        ("townland-wanted", {"locality": "townland", "name": "X"},
         ["locality=townland"], [], [], None, False, None, True, None, []),
        ("stolperstein-item", {"name": "X"}, [], [], ["Q26703203"], None,
         False, None, True, None, []),
        ("stolperstein-both", {"memorial": "stolperstein", "name": "X"}, [], [],
         ["Q26703203"], None, False, None, True, None, []),
        ("plain", {"name": "X"}, [], [], [], None, False, None, True, None, []),
    ]
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    got = {
        r["pair_id"]: r["pre_reject"]
        for r in rejects.pre_candidate_guards(df).collect()
    }
    assert got == {
        "townland": "townland",
        "townland-wanted": None,
        "stolperstein-item": "stolperstein",
        "stolperstein-both": None,
        "plain": None,
    }


def test_final_gate(spark):
    from osm_wikidata_spark.operators import reduce as red
    from osm_wikidata_spark.operators.resolve import final_gate

    rows = [
        # clean single candidate → accepted
        ("Q1", "node", 11, "A", 5.0, {"name": "A"}, ["amenity=school"], True),
        # number as name (checked over RAW candidates)
        ("Q2", "node", 21, "22", 5.0, {"name": "22"}, [], True),
        # two candidates survive reduction
        ("Q3", "node", 31, "C", 5.0, {"name": "C"}, ["shop=books"], True),
        ("Q3", "node", 32, "C", 5.0, {"name": "C"}, ["amenity=cafe"], True),
        # claimed by two items
        ("Q4", "node", 77, "D", 5.0, {"name": "D"}, [], True),
        ("Q5", "node", 77, "D", 5.0, {"name": "D"}, [], True),
        # same numeric id, DIFFERENT osm_type: distinct records, no conflict
        ("QA", "node", 99, "H", 5.0, {"name": "H"}, [], True),
        ("QB", "way", 99, "H2", 5.0, {"name": "H2"}, [], True),
        # already tagged
        ("Q6", "node", 61, "E", 5.0, {"name": "E", "wikidata": "Q6"}, [], True),
        # digit housename
        ("Q7", "node", 71, "F", 5.0, {"name": "F", "addr:housename": "12"}, [], True),
    ]
    schema = (
        "item_id string, osm_type string, osm_id bigint, name string, dist double,"
        " tags map<string,string>, matching_tags array<string>, name_match boolean"
    )
    cands = spark.createDataFrame(rows, schema)
    reduced = red.reduce_candidates(
        cands, building_flag=None, reservoir_flag=None
    )
    bad = spark.createDataFrame([("Q0",)], "item_id string")
    out = final_gate(cands, reduced, bad_item_ids=bad)
    notes = {r["item_id"]: r["note"] for r in out.collect()}
    assert notes["Q1"] is None
    assert notes["Q2"] == "number as name"
    assert notes["Q3"] == "more than one candidate found"
    assert notes["Q4"] == "OSM candidate matches multiple Wikidata items"
    assert notes["Q5"] == "OSM candidate matches multiple Wikidata items"
    assert notes["Q6"] == "candidate already tagged"
    assert notes["Q7"] == "number as house name"
    # claim counting keys on (osm_type, osm_id) like the reference's
    # osm_count — a node and a way sharing a numeric id don't conflict
    assert notes["QA"] is None and notes["QB"] is None


def test_embassy_country_mismatch(spark):
    pairs = spark.createDataFrame(
        [
            ("wrong-name", {"name": "Embassy of France"}, ["Q183"]),
            ("right-name", {"name": "Embassy of France"}, ["Q142"]),
            ("wrong-code", {"name": "An Embassy", "country": "DE"}, ["Q142"]),
            ("right-code", {"name": "An Embassy", "country": "FR"}, ["Q142"]),
            ("no-signal", {"name": "An Embassy"}, ["Q142"]),
        ],
        "pair_id string, osm_tags map<string,string>, country_qids array<string>",
    )
    embassy_dim = rejects.embassy_dim_from_names(
        spark, {"Q142": ["France", "French"], "Q183": ["Germany", "German"]}
    )
    iso_dim = spark.createDataFrame(
        [("Q142", "FR"), ("Q183", "DE")], "country_qid string, iso_code string"
    )
    out = rejects.diplomatic_mission_different_country(
        pairs, embassy_dim, iso_dim, ["pair_id"]
    )
    got = {r["pair_id"]: r["embassy_mismatch"] for r in out.collect()}
    assert got == {
        "wrong-name": True,
        "right-name": False,
        "wrong-code": True,
        "right-code": False,
        "no-signal": False,
    }


def test_is_diplomatic_mission_expr(spark):
    df = spark.createDataFrame(
        [
            ("tag", ["amenity=embassy"], {}),
            ("office", [], {"office": "diplomatic"}),
            ("name", [], {"name": "Consulate General of X"}),
            ("old-name", [], {"old_name": "Embassy of X"}),
            ("none", [], {"name": "A Pub"}),
        ],
        "pair_id string, matching_tags array<string>, osm_tags map<string,string>",
    )
    got = {
        r["pair_id"]: r["hit"]
        for r in df.select(
            "pair_id",
            rejects.is_diplomatic_mission(
                F.col("matching_tags"), F.col("osm_tags")
            ).alias("hit"),
        ).collect()
    }
    assert got == {
        "tag": True, "office": True, "name": True, "old-name": False, "none": False,
    }


def test_final_gate_ignore_existing(spark):
    """ignore_existing=True drops ONLY the already-tagged check (the
    reference's --ignore-existing re-upload mode): Q6 passes the gate
    while every other note is unchanged."""
    from osm_wikidata_spark.operators import reduce as red
    from osm_wikidata_spark.operators.resolve import final_gate

    rows = [
        ("Q1", "node", 11, "A", 5.0, {"name": "A"}, ["amenity=school"], True),
        ("Q6", "node", 61, "E", 5.0, {"name": "E", "wikidata": "Q6"}, [], True),
        ("Q2", "node", 21, "22", 5.0, {"name": "22"}, [], True),
    ]
    schema = (
        "item_id string, osm_type string, osm_id bigint, name string, dist double,"
        " tags map<string,string>, matching_tags array<string>, name_match boolean"
    )
    cands = spark.createDataFrame(rows, schema)
    reduced = red.reduce_candidates(cands, building_flag=None, reservoir_flag=None)
    notes = {
        r["item_id"]: r["note"]
        for r in final_gate(cands, reduced, ignore_existing=True).collect()
    }
    assert notes["Q6"] is None          # tagged candidate now passes
    assert notes["Q1"] is None          # clean row unaffected
    assert notes["Q2"] == "number as name"  # other notes unchanged

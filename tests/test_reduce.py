"""Per-type candidate-reduction rule tests (G2-G10), mirroring the
reference's matcher tests (tests/test_matcher.py:1043-1095 pins G4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_wikidata_spark.operators import reduce as red

CAND_SCHEMA = (
    "item_id string, osm_type string, osm_id bigint, name string, dist double,"
    " tags map<string,string>, matching_tags array<string>, name_match boolean"
)


def _cands(spark, rows):
    return spark.createDataFrame(rows, CAND_SCHEMA)


def _kept(df):
    return sorted(r["osm_id"] for r in df.collect())


# --------------------------------------------------------------- G4


def test_prefer_tag_match_over_building_only(spark):
    """The Shepperton case (reference tests/test_matcher.py:1043-1095): a
    name+railway=station match beats a building-only match."""
    rows = [
        ("Q1", "node", 3397249904, "Shepperton", 26.78,
         {"railway": "station"}, ["railway=station"], True),
        ("Q1", "way", 246812406, "Shepperton Station", 0.0,
         {"building": "yes"}, ["building"], True),
    ]
    out = red.prefer_tag_match_over_building_only_match(_cands(spark, rows))
    assert _kept(out) == [3397249904]


def test_prefer_tag_match_distance_exception(spark):
    """Q18160107 comment (matcher.py:957-960): keep everything when the good
    matches are all >100 m and a building-only one is <10 m."""
    rows = [
        ("Q1", "node", 1, "A", 300.0, {"railway": "station"}, ["railway=station"], True),
        ("Q1", "way", 2, "A", 5.0, {"building": "yes"}, ["building"], True),
    ]
    out = red.prefer_tag_match_over_building_only_match(_cands(spark, rows))
    assert _kept(out) == [1, 2]


def test_prefer_tag_match_single_candidate_passes(spark):
    rows = [("Q1", "way", 2, "A", 5.0, {"building": "yes"}, ["building"], True)]
    out = red.prefer_tag_match_over_building_only_match(_cands(spark, rows))
    assert _kept(out) == [2]


# --------------------------------------------------------------- G3 / G5


def test_prefer_key_over_building(spark):
    rows = [
        ("Q1", "node", 1, "A", 10.0, {}, ["amenity=library"], True),
        ("Q1", "way", 2, "A", 10.0, {}, ["building"], True),
        # group with two amenity matches passes unchanged
        ("Q2", "node", 3, "B", 10.0, {}, ["amenity=library"], True),
        ("Q2", "node", 4, "B", 10.0, {}, ["amenity=library"], True),
        # group with a non-building other passes unchanged
        ("Q3", "node", 5, "C", 10.0, {}, ["amenity=library"], True),
        ("Q3", "node", 6, "C", 10.0, {}, ["shop=books"], True),
    ]
    out = red.prefer_key_over_building(_cands(spark, rows), "amenity")
    assert _kept(out) == [1, 3, 4, 5, 6]


def test_prefer_railway_station(spark):
    rows = [
        ("Q1", "node", 1, "S", 10.0, {}, ["railway=station"], True),
        ("Q1", "node", 2, "S", 10.0, {}, ["railway=tram_stop"], True),
        ("Q1", "way", 3, "S", 10.0, {}, ["building=train_station"], True),
        # unrelated other tag -> unchanged
        ("Q2", "node", 4, "T", 10.0, {}, ["railway=station"], True),
        ("Q2", "node", 5, "T", 10.0, {}, ["amenity=cafe"], True),
    ]
    out = red.prefer_railway_station(_cands(spark, rows))
    assert _kept(out) == [1, 4, 5]


def test_prefer_proper_name_match_faithful(spark):
    """G2 with the reference's exact predicates (matcher.py:1505-1539):
    a unique proper name match wins over housename/operator-only matches,
    image-only name matches don't count as proper, and a candidate that is
    neither blocks the shrink."""
    from osm_wikidata_spark.functions.udfs import proper_name_flags_udf
    import json

    def mm(d):
        return json.dumps(d)

    rows = [
        # Q1: proper name vs operator-only -> keep 1
        ("Q1", 1, mm({"name": [["good", "X", [["label", "en"]]]]})),
        ("Q1", 2, mm({"operator": [["good", "X", [["label", "en"]]]]})),
        # Q2: image-only name match is NOT proper; other is operator-only →
        # no proper candidate at all -> unchanged
        ("Q2", 3, mm({"name": [["good", "X", [["image", None]]]]})),
        ("Q2", 4, mm({"operator": [["good", "X", [["label", "en"]]]]})),
        # Q3: other candidate matched on alt_name (neither proper nor
        # housename/operator) -> blocks the shrink
        ("Q3", 5, mm({"name": [["good", "X", [["label", "en"]]]]})),
        ("Q3", 6, mm({"alt_name": [["good", "X", [["label", "en"]]]]})),
    ]
    df = spark.createDataFrame(rows, "item_id string, osm_id int, match_json string")
    flags = df.select(
        "item_id", "osm_id", proper_name_flags_udf("match_json").alias("f")
    ).select("item_id", "osm_id", F.col("f.proper").alias("proper"),
             F.col("f.housename_or_operator").alias("ho"))
    out = red.prefer_proper_name_match(flags, F.col("proper"), F.col("ho"))
    assert _kept(out) == [1, 3, 4, 5, 6]


# --------------------------------------------------------------- G6


def test_prefer_stop_area_relation(spark):
    rows = [
        ("Q1", "relation", 1, "S", 10.0, {"public_transport": "stop_area"}, [], True),
        ("Q1", "node", 2, "S", 10.0, {"public_transport": "platform"}, [], True),
        # item not expected to be a stop_area -> unchanged
        ("Q2", "relation", 3, "T", 10.0, {"public_transport": "stop_area"}, [], True),
        ("Q2", "node", 4, "T", 10.0, {}, [], True),
    ]
    cands = _cands(spark, rows).withColumn(
        "expected_tags",
        F.when(
            F.col("item_id") == "Q1",
            F.array(F.lit("public_transport=stop_area")),
        ).otherwise(F.array(F.lit("amenity=school"))),
    )
    out = red.prefer_stop_area_relation(cands)
    assert _kept(out) == [1, 3, 4]


def test_prefer_stop_area_null_expected_tags_passes_through(spark):
    """NULL expected_tags (item absent from the dim) must leave the group
    untouched — a bare NULL in the shrink predicate would silently drop
    every non-stop-area candidate."""
    rows = [
        ("Q1", "relation", 1, "S", 10.0, {"public_transport": "stop_area"}, [], True),
        ("Q1", "node", 2, "S", 10.0, {"public_transport": "platform"}, [], True),
    ]
    cands = _cands(spark, rows).withColumn(
        "expected_tags", F.lit(None).cast("array<string>")
    )
    out = red.prefer_stop_area_relation(cands)
    assert _kept(out) == [1, 2]


# --------------------------------------------------------------- G7 / G8


def test_prefer_farmhouse(spark):
    rows = [
        ("Q1", "way", 1, "Manor", 10.0, {}, [], True),
        ("Q1", "way", 2, "Manor Farm House", 10.0, {}, [], True),
        ("Q2", "way", 3, "Manor House", 10.0, {}, [], True),
        ("Q2", "way", 4, "Manor Farmhouse", 10.0, {}, [], True),
        # names unrelated -> unchanged
        ("Q3", "way", 5, "Other", 10.0, {}, [], True),
        ("Q3", "way", 6, "Manor Farm House", 10.0, {}, [], True),
    ]
    out = red.prefer_farmhouse(_cands(spark, rows))
    assert _kept(out) == [2, 4, 5, 6]


def test_prefer_farmhouse_item_gate(spark):
    """matcher.py:913-914: the rule only fires for farmhouse ITEMS; a null
    flag (item absent from the dim) counts as not-a-farmhouse."""
    rows = [
        ("Q1", "way", 1, "Manor", 10.0, {}, [], True),
        ("Q1", "way", 2, "Manor Farm House", 10.0, {}, [], True),
        ("Q2", "way", 3, "Manor", 10.0, {}, [], True),
        ("Q2", "way", 4, "Manor Farm House", 10.0, {}, [], True),
    ]
    cands = _cands(spark, rows).withColumn(
        "is_farmhouse",
        F.when(F.col("item_id") == "Q1", True).otherwise(F.lit(None).cast("boolean")),
    )
    out = red.prefer_farmhouse(cands, farmhouse_flag="is_farmhouse")
    assert _kept(out) == [2, 3, 4]  # Q2 (null flag) passes through unchanged


def test_filter_bridge_item_gate(spark):
    rows = [
        ("Q1", "way", 1, "B", 10.0, {"man_made": "bridge"}, [], True),
        ("Q1", "way", 2, "B", 10.0, {"bridge": "yes", "highway": "primary"}, [], True),
    ]
    cands = _cands(spark, rows).withColumn("is_bridge_item", F.lit(False))
    out = red.filter_bridge(cands, bridge_flag="is_bridge_item")
    assert _kept(out) == [1, 2]  # non-bridge item: rule gated off


def test_reduce_null_flags_pass_through(spark):
    """Null building/reservoir flags must not make candidates vanish."""
    rows = [
        ("Q1", "way", 1, "B", 10.0, {"building": "yes"}, ["building"], True),
        ("Q1", "node", 2, "B", 10.0, {"amenity": "bar"}, [], True),
    ]
    cands = (
        _cands(spark, rows)
        .withColumn("is_primarily_building", F.lit(None).cast("boolean"))
        .withColumn("is_reservoir", F.lit(None).cast("boolean"))
    )
    out = red.reduce_candidates(cands)
    assert _kept(out) == [1, 2]


def test_filter_bridge(spark):
    rows = [
        ("Q1", "way", 1, "B", 10.0, {"man_made": "bridge"}, [], True),
        ("Q1", "way", 2, "B", 10.0, {"bridge": "yes", "highway": "primary"}, [], True),
        ("Q1", "node", 3, "B", 10.0, {"amenity": "cafe"}, [], True),
        # no bridge candidate in the group -> unchanged
        ("Q2", "way", 4, "C", 10.0, {"bridge": "yes"}, [], True),
    ]
    out = red.filter_bridge(_cands(spark, rows))
    assert _kept(out) == [1, 3, 4]


# --------------------------------------------------------------- G9


def test_filter_schools(spark):
    rows = [
        ("Q1", "node", 1, "S", 10.0, {}, ["amenity=school"], True),
        ("Q1", "way", 2, "S", 10.0, {}, ["building=school"], True),
        # an other with extra tags blocks the shrink
        ("Q2", "node", 3, "T", 10.0, {}, ["amenity=school"], True),
        ("Q2", "way", 4, "T", 10.0, {}, ["building=school", "amenity=school"], True),
    ]
    out = red.filter_schools(_cands(spark, rows))
    assert _kept(out) == [1, 3, 4]


def test_filter_churches(spark):
    rows = [
        ("Q1", "node", 1, "C", 10.0, {}, ["amenity=place_of_worship"], True),
        ("Q1", "way", 2, "C", 10.0, {}, ["religion=christian"], True),
    ]
    out = red.filter_churches(_cands(spark, rows))
    assert _kept(out) == [1]


def test_filter_station_branch1(spark):
    rows = [
        ("Q1", "node", 1, "S", 10.0, {}, ["railway=station"], True),
        ("Q1", "node", 2, "S", 10.0, {}, ["railway=tram_stop"], True),
        ("Q1", "node", 3, "S", 10.0, {}, ["railway=tram_stop"], True),
    ]
    out = red.filter_station(_cands(spark, rows))
    assert _kept(out) == [1]


def test_filter_station_branch2(spark):
    rows = [
        ("Q1", "node", 1, "S", 10.0, {}, ["public_transport=station"], True),
        ("Q1", "node", 2, "S", 10.0, {}, ["railway=tram_stop"], True),
        # two pt stations -> unchanged
        ("Q2", "node", 3, "T", 10.0, {}, ["public_transport=station"], True),
        ("Q2", "node", 4, "T", 10.0, {}, ["public_transport=station"], True),
    ]
    out = red.filter_station(_cands(spark, rows))
    assert _kept(out) == [1, 3, 4]


def test_filter_building_and_reservoir(spark):
    rows = [
        ("Q1", "way", 1, "B", 10.0, {"building": "yes"}, ["building"], True),
        ("Q1", "node", 2, "B", 10.0, {"amenity": "bar"}, [], True),
        # way without building tag -> unchanged
        ("Q2", "way", 3, "C", 10.0, {"landuse": "grass"}, [], True),
        ("Q2", "node", 4, "C", 10.0, {}, [], True),
    ]
    out = red.filter_building(_cands(spark, rows))
    assert _kept(out) == [1, 3, 4]

    res = red.filter_reservoir(_cands(spark, rows))
    assert _kept(res) == [1, 3]


# --------------------------------------------------------------- G1 / G10


def test_filter_distant_exact(spark):
    rows = [
        ("Q1", "node", 1, "A", 20.0, {}, [], True),
        ("Q1", "node", 2, "A", 1500.0, {}, [], True),
        # a 100 m candidate blocks the shrink
        ("Q2", "node", 3, "B", 20.0, {}, [], True),
        ("Q2", "node", 4, "B", 100.0, {}, [], True),
        # place candidates disable the rule
        ("Q3", "node", 5, "C", 20.0, {"place": "town"}, [], True),
        ("Q3", "node", 6, "C", 1500.0, {}, [], True),
    ]
    out = red.filter_distant_exact(_cands(spark, rows))
    assert _kept(out) == [1, 3, 4, 5, 6]


def test_reduce_candidates_composition(spark):
    rows = [
        # school group shrinks to the amenity=school node
        ("Q1", "node", 1, "S", 10.0, {}, ["amenity=school"], True),
        ("Q1", "way", 2, "S", 10.0, {}, ["building=school"], True),
        # building item: way beats node
        ("Q2", "way", 3, "B", 10.0, {"building": "yes"}, ["building"], True),
        ("Q2", "node", 4, "B", 10.0, {"amenity": "bar"}, [], True),
        # reservoir item
        ("Q3", "way", 5, "R", 10.0, {}, [], True),
        ("Q3", "node", 6, "R", 10.0, {}, [], True),
    ]
    cands = (
        _cands(spark, rows)
        .withColumn("is_primarily_building", F.col("item_id") == "Q2")
        .withColumn("is_reservoir", F.col("item_id") == "Q3")
    )
    out = red.reduce_candidates(cands)
    assert _kept(out) == [1, 3, 5]


def test_reduce_candidates_single_shuffle_plan(spark):
    """The full G10 chain (incl. the gated building/reservoir rules) must
    stay one linear pipeline over a single item_id hash partitioning —
    the filter/union branching it replaced cost 4 Exchanges."""
    import re

    rows = [
        ("Q1", "node", 1, "S", 10.0, {}, ["amenity=school"], True),
        ("Q1", "way", 2, "S", 10.0, {}, ["building=school"], True),
    ]
    cands = (
        _cands(spark, rows)
        .withColumn("is_primarily_building", F.lit(False))
        .withColumn("is_reservoir", F.lit(False))
    )
    plan = red.reduce_candidates(cands)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges == 1, plan

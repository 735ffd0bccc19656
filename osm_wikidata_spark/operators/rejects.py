"""Pair-level reject reasons (SURVEY.md §2.8 V3/V5/V6 + G11 vetoes).

The reference duplicates ~15 inline guards between ``find_item_matches``
(`/root/reference/matcher/matcher.py:694-880`) and ``check_item_candidate``
(matcher.py:995-1135), the latter returning exact reject-reason strings
pinned by `/root/reference/tests/test_matcher.py:1230-1263`.  This module
re-expresses the whole chain as ONE column expression over the scored pair
DataFrame — every guard is JVM-side (map/array ops), no UDFs.

Pair-table contract (one row per (item, candidate)):

    osm_tags          map<string,string>   candidate tags
    item_tags         array<string>        item's expected tags (F5 output)
    categories        array<string>        item's enwiki categories
    instanceof        array<string>        item's P31 QIDs
    dist              double (nullable)    candidate distance, metres
    identifier_match  boolean              M4 output
    address_match     boolean (nullable)   M5 tri-state, post-extract (M6)
    name_match        boolean              any name match (M2 non-empty)
    name_match_detail array<struct<osm_key string, match_type string>>
                                           flattened M2 entries (nullable)
    matching_tags     array<string>        M7 output

``candidate_rejects`` adds a ``reject`` string column (null = accepted),
with reasons byte-identical to the reference's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ------------------------------------------------------- map/array helpers


def _split_vals(tags: Column, key: str) -> Column:
    """osm_tags[key] split on ';' — empty array when the key is absent
    (matcher.py:477, 490: set(tags[k].split(';')) if k in tags else [])."""
    return F.coalesce(
        F.split(F.element_at(tags, key), ";"), F.array().cast("array<string>")
    )


def _val(tags: Column, key: str) -> Column:
    return F.element_at(tags, key)


def _has_any(col: Column, values: list[str]) -> Column:
    out = F.lit(False)
    for v in values:
        out = out | F.array_contains(col, v)
    return out


def _any_cat_startswith(categories: Column, prefixes: list[str]) -> Column:
    # one exists() pass; no per-prefix lambdas (PySpark HOF lambdas must be
    # unary — default-arg binding trips the arity check)
    return F.exists(
        categories,
        lambda c: _reduce_or([c.startswith(p) for p in prefixes]),
    )


def _any_cat_contains_lc(categories: Column, needles: list[str]) -> Column:
    return F.exists(
        categories,
        lambda c: F.lit(False)
        | _reduce_or([F.lower(c).contains(n) for n in needles]),
    )


def _reduce_or(cols: list[Column]) -> Column:
    out = F.lit(False)
    for c in cols:
        out = out | c
    return out


# ----------------------------------------------------- item type predicates
# column analogs of model.Item's instanceof/category heuristics


def is_a_station_item(instanceof: Column, categories: Column) -> Column:
    """model.py:924-944."""
    return _has_any(instanceof, ["Q55488", "Q928830", "Q4663385"]) | _any_cat_contains_lc(
        categories,
        [
            "railway stations",
            "railroad stations",
            "train stations",
            "metro stations",
            "subway stations",
        ],
    )


def is_a_stadium_item(instanceof: Column, categories: Column) -> Column:
    """model.py:946-967."""
    return _has_any(instanceof, ["Q483110", "Q641226", "Q1076486"]) | _any_cat_contains_lc(
        categories,
        ["football venues", "ice rinks", "stadiums", "velodromes", "cycling venues", "grounds"],
    )


def is_a_historic_district_item(instanceof: Column, categories: Column) -> Column:
    """model.py:905-922."""
    positive = F.array_contains(instanceof, "Q15243209") | _any_cat_startswith(
        categories, ["Historic district"]
    )
    excluded = _any_cat_startswith(
        categories,
        [
            "Historic district contributing properties",
            "Churches ",
            "Towers ",
            "Educational institutions ",
            "Schools ",
            "Houses ",
            "Historic house ",
            "Museums ",
            "Buildings and structures ",
        ],
    ) | F.exists(categories, lambda c: c.contains(" buildings "))
    return positive & ~excluded


def is_mountain_range_item(instanceof: Column) -> Column:
    """model.py:860-862."""
    return F.array_contains(instanceof, "Q46831")


# ----------------------------------------------------------------- V3 / V4


def is_osm_bus_stop(osm_tags: Column) -> Column:
    """matcher.py:399-403."""
    return (_val(osm_tags, "highway") == "bus_stop") | (
        (_val(osm_tags, "bus") == "yes")
        & (_val(osm_tags, "public_transport") == "stop_position")
    )


def station_house_too_far(
    is_station_item: Column, osm_tags: Column, dist: Column
) -> Column:
    """V3 (matcher.py:406-423): a station name alone is insufficient for an
    ordinary house more than 50 m away."""
    building = _split_vals(osm_tags, "building")
    railway = _split_vals(osm_tags, "railway")
    public_transport = _split_vals(osm_tags, "public_transport")
    return (
        is_station_item
        & dist.isNotNull()
        & (dist > 50)
        & _has_any(building, ["house", "residential", "detached", "semidetached_house"])
        & ~_has_any(railway, ["station", "halt", "historic_station"])
        & ~_has_any(public_transport, ["station", "stop_area"])
        & ~(F.coalesce(_val(osm_tags, "building") == "train_station", F.lit(False)))
    )


# ----------------------------------------------------------------- V1 / V2


def is_building_only_match(matching_tags: Column) -> Column:
    """matcher.py:469-472 — single source of truth in reduce.py so the
    reject chain and the G4 reducer can never diverge on the tag set."""
    from .reduce import is_building_only

    return is_building_only(matching_tags)


def bad_building_match(
    osm_tags: Column, name_match_detail: Column, is_station: Column
) -> Column:
    """V1 (matcher.py:360-396): a building-only tag match whose every name
    match is weak.  ``name_match_detail`` is the flattened M2 output; an
    entry is *weak* when it is both_trimmed, an operator wikidata_trimmed,
    or a wikidata_trimmed on a station item/record.  (The reference's
    extract-only skip is dead code under extract_name_good_enough=True,
    matcher.py:54, 384-388.)"""
    amenity = _split_vals(osm_tags, "amenity")
    osm_station = F.exists(
        F.map_entries(osm_tags),
        lambda e: e["key"].endswith("railway") & e["value"].isin("station", "halt"),
    )
    station = is_station | osm_station
    all_weak = F.forall(
        name_match_detail,
        lambda m: (m["match_type"] == "both_trimmed")
        | ((m["osm_key"] == "operator") & (m["match_type"] == "wikidata_trimmed"))
        | ((m["match_type"] == "wikidata_trimmed") & station),
    )
    has_detail = name_match_detail.isNotNull() & (F.size(name_match_detail) > 0)
    return F.array_contains(amenity, "parking") | (has_detail & all_weak)


def is_bad_match(item_tags: Column, osm_tags: Column) -> Column:
    """V2 hard-coded guards (matcher.py:475-558), minus the data-driven
    BadMatchFilter rows (vetoes.apply_vetoes covers those)."""
    amenity = _split_vals(osm_tags, "amenity")
    building = _split_vals(osm_tags, "building")
    osm_railway_station = F.coalesce(
        _val(osm_tags, "railway") == "station", F.lit(False)
    )
    osm_train_station = F.coalesce(
        _val(osm_tags, "building") == "train_station", F.lit(False)
    )

    checks = [
        # post office shouldn't match a church with a similar name
        F.array_contains(item_tags, "amenity=post_office")
        & F.array_contains(amenity, "place_of_worship")
        & ~F.array_contains(amenity, "post_office"),
        # building only not good enough for car rental/sharing
        F.array_contains(amenity, "car_rental")
        | F.array_contains(amenity, "car_sharing"),
        # Wikidata stable/barn/farm_auxiliary shouldn't match OSM house
        *[
            F.array_contains(item_tags, f"building={bt}")
            & ~F.array_contains(item_tags, "building=house")
            & F.array_contains(building, "house")
            & ~F.array_contains(building, bt)
            for bt in ("stable", "barn", "farm_auxiliary")
        ],
        # Wikidata tower shouldn't match OSM pub
        F.array_contains(item_tags, "building=tower")
        & ~F.array_contains(item_tags, "amenity=pub")
        & F.array_contains(amenity, "pub")
        & ~F.map_contains_key(osm_tags, "man_made"),
        # castle shouldn't match railway station
        F.array_contains(item_tags, "historic=castle")
        & ~F.array_contains(item_tags, "railway=station")
        & (osm_railway_station | osm_train_station)
        & ~F.coalesce(_val(osm_tags, "historic") == "castle", F.lit(False)),
        # station shouldn't match cafe
        F.array_contains(item_tags, "railway=station")
        & ~F.array_contains(item_tags, "amenity=cafe")
        & F.array_contains(amenity, "cafe")
        & ~osm_railway_station
        & ~osm_train_station,
        # station shouldn't match supermarket
        F.array_contains(item_tags, "railway=station")
        & ~F.array_contains(item_tags, "shop=supermarket")
        & F.coalesce(_val(osm_tags, "shop") == "supermarket", F.lit(False))
        & ~osm_railway_station
        & ~osm_train_station,
        # non-station shouldn't match station
        ~F.array_contains(item_tags, "building=train_station") & osm_train_station,
        # petrol station
        ~F.array_contains(item_tags, "amenity=fuel")
        & F.array_contains(amenity, "fuel"),
        # place shouldn't match railway
        F.array_contains(item_tags, "place")
        & ~F.exists(item_tags, lambda t: t.startswith("railway"))
        & ~F.map_contains_key(osm_tags, "place")
        & F.map_contains_key(osm_tags, "railway"),
    ]
    return _reduce_or(checks)


# --------------------------------------------------------------- V5 embassy


def is_diplomatic_mission(matching_tags: Column, osm_tags: Column) -> Column:
    """matcher.py:426-439."""
    name_hit = F.exists(
        F.map_entries(osm_tags),
        lambda e: e["key"].contains("name")
        & ~e["key"].contains("old")
        & _reduce_or(
            [
                F.lower(e["value"]).contains(term)
                for term in ("embassy", "diplomatic", "consulate", "ambassador")
            ]
        ),
    )
    return (
        F.array_contains(matching_tags, "amenity=embassy")
        | F.coalesce(_val(osm_tags, "office") == "diplomatic", F.lit(False))
        | name_hit
    )


def diplomatic_mission_different_country(
    pairs: DataFrame,
    embassy_dim: DataFrame,
    iso_dim: DataFrame,
    id_cols: list[str],
    country_qids_col: str = "country_qids",
    osm_tags_col: str = "osm_tags",
) -> DataFrame:
    """V5 (matcher.py:442-466): flag pairs whose embassy candidate belongs
    to a different country than the item's P137 operator.

    ``embassy_dim``: (country_qid, name_lc, pattern) — one row per country
    name variant, ``pattern`` the reference's word-boundary regex for that
    name (embassy.from_name, embassy.py:894-914; longest name wins).
    ``iso_dim``: (country_qid, iso_code) — wikidata.country_iso_codes_from_qid.
    Both dims are broadcast.  Returns ``pairs`` + ``embassy_mismatch``
    boolean.
    """
    tags = F.col(osm_tags_col)
    with_name = pairs.withColumn(
        "__mission_name", F.coalesce(_val(tags, "name:en"), _val(tags, "name"))
    ).withColumn(
        "__osm_country",
        F.coalesce(_val(tags, "diplomatic:sending_country"), _val(tags, "country")),
    )

    # name-derived country: longest matching country-name variant wins
    name_hits = (
        with_name.filter(F.col("__mission_name").isNotNull())
        .join(
            F.broadcast(embassy_dim),
            F.regexp_like(F.col("__mission_name"), F.col("pattern")),
        )
        .groupBy(*id_cols)
        .agg(F.max_by("country_qid", F.length("name_lc")).alias("__name_qid"))
    )
    with_qid = with_name.join(name_hits, id_cols, "left")
    name_mismatch = F.col("__name_qid").isNotNull() & ~F.array_contains(
        F.col(country_qids_col), F.col("__name_qid")
    )

    # ISO-code check: any item country's code equals the OSM country code
    iso_hits = (
        with_name.select(*id_cols, F.explode(F.col(country_qids_col)).alias("country_qid"))
        .join(F.broadcast(iso_dim), "country_qid")
        .groupBy(*id_cols)
        .agg(F.collect_set(F.upper("iso_code")).alias("__iso_codes"))
    )
    with_iso = with_qid.join(iso_hits, id_cols, "left")
    code_usable = F.col("__osm_country").isNotNull() & F.length(
        "__osm_country"
    ).isin(2, 3)
    code_mismatch = code_usable & ~F.coalesce(
        F.array_contains(F.col("__iso_codes"), F.upper(F.col("__osm_country"))),
        F.lit(False),
    )
    return with_iso.withColumn(
        "embassy_mismatch", name_mismatch | (~name_mismatch & code_mismatch)
    ).drop("__mission_name", "__osm_country", "__name_qid", "__iso_codes")


def embassy_dim_from_names(spark, countries: dict[str, list[str]]) -> DataFrame:
    """Build the (country_qid, name_lc, pattern) dim from a qid → names map
    (the shape of the reference's embassy name table, embassy.py)."""
    import re as _re

    rows = [
        (qid, name.lower(), r"(?i)(?:\b|')(" + _re.escape(name) + r")s?\b")
        for qid, names in countries.items()
        for name in names
    ]
    return spark.createDataFrame(rows, "country_qid string, name_lc string, pattern string")


# ----------------------------------------------------------------- F11


def osm_is_stolperstein(osm_tags: Column) -> Column:
    """matcher.py:574-580."""
    return (F.coalesce(_val(osm_tags, "memorial:type") == "stolperstein", F.lit(False))) | (
        F.coalesce(_val(osm_tags, "memorial") == "stolperstein", F.lit(False))
    )


def pre_candidate_guards(pairs: DataFrame) -> DataFrame:
    """F11: the row filters the reference applies BEFORE scoring each
    candidate (matcher.py:668-683) — townland, stolperstein, historic
    district.  Adds ``pre_reject`` (null = survives).  The address-node
    filter (F10) runs at record-scan time, not here, mirroring the
    reference's ordering."""
    osm_tags = F.col("osm_tags")
    item_tags = F.col("item_tags")
    is_stolperstein_item = F.array_contains(F.col("instanceof"), "Q26703203")
    pre = (
        F.when(
            (F.coalesce(_val(osm_tags, "locality") == "townland", F.lit(False)))
            & ~F.array_contains(item_tags, "locality=townland"),
            "townland",
        )
        .when(
            is_a_historic_district_item(F.col("instanceof"), F.col("categories"))
            & F.map_contains_key(osm_tags, "building"),
            "historic district",
        )
        .when(
            is_stolperstein_item & ~osm_is_stolperstein(osm_tags),
            "stolperstein",
        )
    )
    return pairs.withColumn("pre_reject", pre)


# ------------------------------------------------- the reject-reason chain


def candidate_rejects(pairs: DataFrame) -> DataFrame:
    """check_item_candidate (matcher.py:995-1135) merged with the residual
    ``find_item_matches``-only guards (matcher.py:724-726, 743-749, 784-797,
    824-880) as one column expression.

    Adds ``reject`` (null = accepted) with the reference's exact reason
    strings where check_item_candidate defines one, and the reference's
    inline comment text for the find_item_matches-only guards (those are
    bare ``continue`` statements — the comment is the only prose the
    reference attaches).  Order follows the reference's shared sequence,
    with the find_item_matches-only guards at their reference positions.

    Optional columns (guards needing them evaluate false when absent):

        item_names  array<string>  item's names (cricket-ground guard)
        is_nhle     boolean        item has a P1216 claim (model.py:1116-1118)

    The seamark rule (matcher.py:724-726) *removes* seamark:name entries
    from the name match when the item is not a lighthouse, so here
    ``name_match`` / ``name_match_detail`` are re-derived post-filter and
    the whole chain (including "no match") sees the filtered view.

    The embassy guard lives in :func:`diplomatic_mission_different_country`
    (it needs dim joins); the reference applies it in find_item_matches
    (matcher.py:732-735), not in check_item_candidate, so it is likewise
    separate here.
    """
    osm_tags = F.col("osm_tags")
    item_tags = F.col("item_tags")
    cats = F.col("categories")
    instanceof = F.col("instanceof")
    dist = F.col("dist")
    idm = F.col("identifier_match")
    adm = F.col("address_match")  # nullable boolean
    mt = F.col("matching_tags")

    # seamark:name is only a name match for lighthouses (matcher.py:724-726)
    raw_detail = F.col("name_match_detail")
    not_lighthouse = ~F.array_contains(item_tags, "man_made=lighthouse")
    detail = F.when(
        raw_detail.isNotNull() & not_lighthouse,
        F.filter(raw_detail, lambda m: m["osm_key"] != "seamark:name"),
    ).otherwise(raw_detail)
    nm = F.when(raw_detail.isNotNull(), F.size(detail) > 0).otherwise(
        F.col("name_match")
    )

    item_names = (
        F.col("item_names")
        if "item_names" in pairs.columns
        else F.array().cast("array<string>")
    )
    is_nhle = (
        F.coalesce(F.col("is_nhle"), F.lit(False))
        if "is_nhle" in pairs.columns
        else F.lit(False)
    )

    addr_true = F.coalesce(adm, F.lit(False))
    addr_false = adm.isNotNull() & ~adm
    admin_level = _val(osm_tags, "admin_level").try_cast("int")
    amenity = _split_vals(osm_tags, "amenity")
    building_only = is_building_only_match(mt)
    wd_station = is_a_station_item(instanceof, cats)
    wd_stadium = is_a_stadium_item(instanceof, cats)
    osm_train_station = F.coalesce(
        _val(osm_tags, "building") == "train_station", F.lit(False)
    )

    reject = (
        F.when(
            is_a_historic_district_item(instanceof, cats)
            & F.map_contains_key(osm_tags, "building"),
            "historic district shouldn't match building",
        )
        .when(
            ~idm
            & _any_cat_startswith(cats, ["Cities "])
            & (admin_level == 10),
            "bad city match",
        )
        .when(
            ~idm & station_house_too_far(wd_station, osm_tags, dist),
            "station shouldn't match a distant house",
        )
        .when(addr_false, "OSM and Wikidata addresses differ")
        .when(~(idm | addr_true | nm), "no match")
        .when(
            F.array_contains(item_tags, "building")
            & ~F.array_contains(item_tags, "amenity=car_sharing")
            & ~F.map_contains_key(osm_tags, "building")
            & F.array_contains(amenity, "car_sharing"),
            "Wikidata building shouldn't match car sharing",
        )
        .when(
            building_only
            & addr_true
            & ~nm
            & ~idm
            & F.array_contains(item_tags, "amenity=school")
            & ~F.array_contains(item_tags, "amenity=restaurant")
            & F.array_contains(amenity, "restaurant")
            & ~F.array_contains(amenity, "school"),
            "Wikidata school shouldn't match OSM restaurant",
        )
        .when(
            building_only
            & addr_true
            & ~idm
            & ~F.array_contains(item_tags, "building=train_station")
            & osm_train_station,
            "non-station shouldn't match station by address",
        )
        .when(
            building_only
            & ~addr_true
            & nm
            & ~idm
            & is_bad_match(item_tags, osm_tags),
            "bad match",
        )
        .when(
            ((F.size(mt) == 0) | building_only)
            & (F.array_sort(F.array_distinct(instanceof)) == F.array(F.lit("Q34442"))),
            "nearby road match",
        )
        .when(
            F.coalesce(_val(osm_tags, "amenity") == "parking", F.lit(False))
            & ~F.array_contains(item_tags, "amenity=parking"),
            "parking garage in OSM should only match parking Wikidata item",
        )
        .when(
            is_osm_bus_stop(osm_tags) & ~F.array_contains(instanceof, "Q953806"),
            "nearby match OSM bus stop matching non-bus stop",
        )
        .when(
            F.array_contains(mt, "leisure=park")
            & F.exists(item_names, lambda n: F.lower(n).contains("cricket"))
            & (
                F.coalesce(_val(osm_tags, "designation") == "common", F.lit(False))
                | F.coalesce(
                    F.lower(_val(osm_tags, "name")).contains("common"), F.lit(False)
                )
            ),
            "cricket ground shouldn't match common",
        )
        .when(
            nm
            & ~idm
            & ~addr_true
            & building_only
            & bad_building_match(osm_tags, detail, wd_station),
            "bad building match",
        )
        .when(
            nm
            & ~idm
            & ~addr_true
            & building_only
            & wd_stadium
            & ~F.array_contains(item_tags, "amenity=restaurant")
            & F.array_contains(amenity, "restaurant"),
            "stadium shouldn't match restaurant",
        )
        .when(
            nm
            & ~idm
            & ~addr_true
            & building_only
            & wd_stadium
            & F.coalesce(_val(osm_tags, "shop") == "supermarket", F.lit(False)),
            "stadium shouldn't match supermarket",
        )
        .when(
            (F.array_sort(F.array_distinct(mt)) == F.array(F.lit("natural=peak")))
            & is_mountain_range_item(instanceof)
            & (dist > 100),
            "mountain range shouldn't match peak",
        )
        .when(
            is_nhle & (dist > 500),
            "NHLE items normally have quite precise coordinates",
        )
        .when(
            ~idm
            & F.array_contains(item_tags, "railway=station")
            & ~F.array_contains(item_tags, "amenity=ferry_terminal")
            & F.array_contains(amenity, "ferry_terminal")
            & F.coalesce(_val(osm_tags, "railway") != "station", F.lit(True))
            & F.coalesce(_val(osm_tags, "building") != "train_station", F.lit(True)),
            "station shouldn't match ferry terminal",
        )
        .when(
            F.array_contains(item_tags, "amenity=place_of_worship")
            & ~F.array_contains(item_tags, "man_made=bridge")
            & F.coalesce(_val(osm_tags, "man_made") == "bridge", F.lit(False))
            & ~F.array_contains(amenity, "place_of_worship"),
            "place of worship shouldn't match bridge",
        )
        .when(
            ~nm
            & addr_true
            & (
                F.array_contains(item_tags, "building=apartments")
                | F.array_contains(item_tags, "building=residential")
            )
            & ~F.exists(item_tags, lambda t: t.startswith("shop"))
            & F.map_contains_key(osm_tags, "shop")
            & F.coalesce(
                ~_val(osm_tags, "building").isin("apartments", "residential"),
                F.lit(True),
            ),
            "apartment building shouldn't match shop",
        )
        .when(
            ~nm
            & addr_true
            & F.array_contains(item_tags, "studio=audio")
            & ~F.exists(item_tags, lambda t: t.startswith("shop"))
            & F.map_contains_key(osm_tags, "shop")
            & F.coalesce(_val(osm_tags, "studio") != "audio", F.lit(True)),
            "recording studio shouldn't match shop",
        )
        .when(
            F.array_contains(item_tags, "artwork_type=statue")
            & ~F.array_contains(item_tags, "tourism=museum")
            & F.coalesce(_val(osm_tags, "tourism") == "museum", F.lit(False))
            & F.coalesce(_val(osm_tags, "artwork_type") != "statue", F.lit(True)),
            "statue shouldn't match museum",
        )
        .when(
            ~F.array_contains(item_tags, "historic=memorial")
            & F.coalesce(_val(osm_tags, "historic") == "memorial", F.lit(False)),
            "only memorial should match memorial",
        )
    )
    return pairs.withColumn("reject", reject)

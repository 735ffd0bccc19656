"""Kernel tests for entity-name assembly + tag helpers (F2/F8/F10/M7),
pinned by /root/reference/tests/test_wikidata.py:67-489 semantics."""

from __future__ import annotations

from osm_wikidata_spark.kernel.names import (
    is_address_node,
    matching_tags,
    names_from_entity,
    prefer_specific_tags,
)

TOWER_ENTITY = {
    "labels": {
        "fr": {"language": "fr", "value": "tour Eiffel"},
        "de": {"language": "de", "value": "Eiffelturm"},
        "en": {"language": "en", "value": "Eiffel Tower"},
    },
    "sitelinks": {
        "enwiki": {"site": "enwiki", "title": "Eiffel Tower", "badges": []},
        "frwiki": {"site": "frwiki", "title": "Tour Eiffel", "badges": []},
        "dewiki": {"site": "dewiki", "title": "Eiffelturm", "badges": []},
    },
    "aliases": {
        "en": [
            {"language": "en", "value": "Tour Eiffel"},
            {"language": "en", "value": "The Eiffel Tower"},
        ],
    },
    "claims": {
        "P373": [
            {"mainsnak": {"datavalue": {"value": "Eiffel Tower"}}},
        ],
    },
}


def test_names_from_entity():
    # mirrors tests/test_wikidata.py:475-489
    names = names_from_entity(TOWER_ENTITY)
    assert names == {
        "The Eiffel Tower": [("alias", "en")],
        "Eiffel Tower": [("label", "en"), ("sitelink", "enwiki"), ("commonscat", None)],
        "Eiffelturm": [("label", "de"), ("sitelink", "dewiki")],
        "tour Eiffel": [("label", "fr"), ("sitelink", "frwiki")],
        "Tour Eiffel": [("alias", "en")],
    }


def test_names_from_entity_edge_cases():
    assert names_from_entity({}) is None
    assert names_from_entity({"descriptions": {}}) is None

    # sitelink folds into existing lowercase-first label (wikidata.py:955-960)
    entity = {
        "labels": {"fr": {"language": "fr", "value": "tour Eiffel"}},
        "sitelinks": {"frwiki": {"title": "Tour Eiffel"}},
    }
    assert names_from_entity(entity) == {
        "tour Eiffel": [("label", "fr"), ("sitelink", "frwiki")]
    }

    # Category: prefix stripped (wikidata.py:951-953)
    entity = {
        "labels": {},
        "sitelinks": {"commonswiki": {"title": "Category:Test Things"}},
    }
    assert names_from_entity(entity) == {"Test Things": [("sitelink", "commonswiki")]}

    # a bare "Category:" title strips to nothing — skipped, not IndexError
    entity = {
        "labels": {"en": {"language": "en", "value": "Thing"}},
        "sitelinks": {"commonswiki": {"title": "Category:"}},
    }
    assert names_from_entity(entity) == {"Thing": [("label", "en")]}

    # alias gate: >3 aliases per language skipped (wikidata.py:963-965)
    entity = {
        "labels": {},
        "sitelinks": {},
        "aliases": {
            "en": [{"value": f"A{i}"} for i in range(4)],
            "de": [{"value": "Keep"}],
        },
    }
    assert names_from_entity(entity) == {"Keep": [("alias", "de")]}

    # image basename: extension + noise suffixes stripped (wikidata.py:996-1013)
    entity = {
        "labels": {},
        "sitelinks": {},
        "claims": {
            "P18": [
                {"mainsnak": {"datavalue": {"value": "Test House - geograph.org.uk - 12345.jpg"}}},
            ]
        },
    }
    assert names_from_entity(entity) == {"Test House": [("image", None)]}

    # skip_lang drops labels and matching sitelinks (wikidata.py:944-949)
    names = names_from_entity(TOWER_ENTITY, skip_lang={"de"})
    assert "Eiffelturm" in names
    assert names["Eiffelturm"] == [("sitelink", "dewiki")]


def test_matching_tags():
    # semantics of matcher.py:348-357 incl. ;-multivalue and k=v preference
    osm = {"amenity": "school;community_centre", "building": "yes"}
    assert matching_tags(osm, {"amenity=school", "building"}) == {
        "amenity=school", "building",
    }
    assert matching_tags(osm, {"amenity=school", "amenity"}) == {"amenity=school"}
    assert matching_tags(osm, {"amenity=pub"}) == set()
    assert matching_tags({}, {"building"}) == set()


def test_prefer_specific_tags():
    assert prefer_specific_tags({"building", "building=yes"}) == {"building=yes"}
    assert prefer_specific_tags({"building"}) == {"building"}


def test_is_address_node():
    # matcher.py:561-571
    assert is_address_node("node", {"addr:housenumber": "1", "addr:street": "X"})
    assert is_address_node("node", {"addr:full": "1 X", "source": "import"})
    assert not is_address_node("way", {"addr:housenumber": "1"})
    assert not is_address_node("node", {"addr:housenumber": "1", "addr:housename": "Y"})
    assert not is_address_node("node", {"addr:housenumber": "1", "name": "Y"})

"""S12 write-back data plane (sinks/changesets.py): changeset document,
element mutation semantics, osmChange read-back."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from osm_wikidata_spark.sinks.changesets import (
    new_changeset_xml,
    parse_osm_change,
    tag_elements,
)


def test_new_changeset_xml_layout():
    got = new_changeset_xml("add wikidata tags", {"bot": "yes", "empty": ""})
    assert got == (
        "<osm>\n  <changeset>\n"
        '    <tag k="created_by" v="https://osm.wikidata.link/"/>\n'
        '    <tag k="comment" v="add wikidata tags"/>\n'
        '    <tag k="bot" v="yes"/>\n'
        "  </changeset>\n</osm>"
    )
    assert "&amp;" in new_changeset_xml("A & B")  # html-escaped comment


def _element(tags: dict[str, str]) -> str:
    tag_xml = "".join(f'<tag k="{k}" v="{v}"/>' for k, v in tags.items())
    return f'<osm><node id="123" version="2">{tag_xml}</node></osm>'


def test_tag_elements_mutation(spark):
    rows = [
        # plain element → gets wikidata + wikipedia tags + changeset attr
        ("a", _element({"name": "X"}), "Q100", "en", "X_(place)"),
        # already tagged → skipped (check_if_already_tagged)
        ("b", _element({"wikidata": "Q1"}), "Q100", None, None),
        # bare wikipedia tag → overwritten, not duplicated
        ("c", _element({"wikipedia": "old"}), "Q7", "de", "Titel"),
        # language-specific wikipedia tag → left alone
        ("d", _element({"wikipedia:en": "Keep"}), "Q8", "en", "New"),
    ]
    df = spark.createDataFrame(
        rows, "id string, element_xml string, qid string, wiki_lang string, wiki_title string"
    )
    out = {r["id"]: r for r in tag_elements(df, changeset_id=777).collect()}

    a = ET.fromstring(out["a"]["element_data"])
    assert a[0].get("changeset") == "777"
    tags = {t.get("k"): t.get("v") for t in a.iter("tag")}
    assert tags == {"name": "X", "wikidata": "Q100", "wikipedia": "en:X_(place)"}

    assert out["b"]["skipped"] and out["b"]["element_data"] is None

    c_tags = {t.get("k"): t.get("v") for t in ET.fromstring(out["c"]["element_data"]).iter("tag")}
    assert c_tags["wikipedia"] == "de:Titel"
    assert list(c_tags).count("wikipedia") == 1

    d_tags = {t.get("k"): t.get("v") for t in ET.fromstring(out["d"]["element_data"]).iter("tag")}
    assert d_tags["wikipedia:en"] == "Keep" and "wikipedia" not in d_tags


def test_parse_osm_change_roundtrip(spark):
    payload = (
        "<osmChange>"
        '<modify><node changeset="55" id="11" timestamp="2026-01-01T00:00:00Z">'
        '<tag k="wikidata" v="Q42"/><tag k="name" v="X"/></node></modify>'
        '<modify><way changeset="55" id="22" timestamp="2026-01-02T00:00:00Z">'
        '<tag k="wikidata" v="Q7"/></way></modify>'
        '<create><relation changeset="56" id="33" timestamp="2026-01-03T00:00:00Z">'
        '<tag k="name" v="untagged"/></relation></create>'
        "</osmChange>"
    )
    df = spark.createDataFrame([(payload,)], "payload string")
    rows = sorted(
        (r["osm_type"], r["changeset_id"], r["osm_id"], r["item_id"], r["saved"])
        for r in parse_osm_change(df).collect()
    )
    # the untagged relation is dropped; node + way parse with item ids
    assert rows == [
        ("node", 55, 11, 42, "2026-01-01T00:00:00Z"),
        ("way", 55, 22, 7, "2026-01-02T00:00:00Z"),
    ]


def test_parse_osm_change_malformed_values_null_not_crash(spark):
    """Attribute/tag values ride in as XML strings; under ANSI mode a
    plain cast would make one malformed element ("QABC", changeset="x")
    a whole-job DIVIDE-class failure.  try_cast marks them NULL and the
    well-formed siblings survive."""
    payload = (
        "<osmChange>"
        '<modify><node changeset="x" id="11" timestamp="T">'
        '<tag k="wikidata" v="QABC"/></node></modify>'
        '<modify><way changeset="55" id="22" timestamp="T2">'
        '<tag k="wikidata" v="Q7"/></way></modify>'
        "</osmChange>"
    )
    df = spark.createDataFrame([(payload,)], "payload string")
    rows = sorted(
        (r["osm_type"], r["changeset_id"], r["osm_id"], r["item_id"])
        for r in parse_osm_change(df).collect()
    )
    assert rows == [("node", None, 11, None), ("way", 55, 22, 7)]


def test_parse_osm_change_absent_actions_and_kinds(spark):
    """Documents missing whole actions/kinds parse as null arrays — the
    null→[] coalescing must keep sibling elements alive (flatten/concat
    would otherwise null the row out)."""
    payloads = [
        ('<osmChange><modify><node changeset="1" id="2" timestamp="T">'
         '<tag k="wikidata" v="Q5"/></node></modify></osmChange>',),
        ('<osmChange><create><way changeset="3" id="4" timestamp="T2">'
         '<tag k="wikidata" v="Q6"/></way></create></osmChange>',),
        ("<osmChange></osmChange>",),
    ]
    df = spark.createDataFrame(payloads, "payload string")
    rows = sorted(
        (r["osm_type"], r["changeset_id"], r["osm_id"], r["item_id"])
        for r in parse_osm_change(df).collect()
    )
    assert rows == [("node", 1, 2, 5), ("way", 3, 4, 6)]


def test_tag_elements_null_title(spark):
    """wiki_lang set but wiki_title null must NOT emit a wikipedia tag
    (the literal 'en:None' corruption)."""
    df = spark.createDataFrame(
        [("a", _element({"name": "X"}), "Q1", "en", None)],
        "id string, element_xml string, qid string, wiki_lang string, wiki_title string",
    )
    row = tag_elements(df, changeset_id=1).collect()[0]
    tags = {t.get("k") for t in ET.fromstring(row["element_data"]).iter("tag")}
    assert tags == {"name", "wikidata"}

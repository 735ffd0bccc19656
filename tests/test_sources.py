"""API-payload dim sources (S8/S9, sources/api_payloads.py): directory
load, polymorphic-claim parsing, missing-entity and skip semantics."""

from __future__ import annotations

import json
import os

from osm_wikidata_spark.sources.api_payloads import (
    extract_bold_names,
    parse_extracts,
    parse_wbgetentities,
    read_extracts_dir,
    read_wbgetentities_dir,
)

_ENTITY = {
    "id": "Q42",
    "labels": {"en": {"language": "en", "value": "Adams Building"}},
    "aliases": {"en": [{"language": "en", "value": "The Adams"}]},
    "sitelinks": {"enwiki": {"site": "enwiki", "title": "Adams Building"}},
    "claims": {
        # entity-id value
        "P31": [{"mainsnak": {"datavalue": {"value": {"entity-type": "item", "id": "Q41176"}}}}],
        # plain-string value (polymorphic vs P31 — breaks from_json)
        "P1216": [{"mainsnak": {"datavalue": {"value": "1234567"}}}],
        # coordinate value
        "P625": [{"mainsnak": {"datavalue": {"value": {"latitude": 51.5, "longitude": -0.1}}}}],
        # monolingual value
        "P6375": [{"mainsnak": {"datavalue": {"value": {"text": "1 Main St", "language": "en"}}}}],
        # novalue snak: no datavalue key at all
        "P571": [{"mainsnak": {"snaktype": "novalue"}}],
    },
}


def test_wbgetentities_polymorphic_claims(spark):
    # novalue P1216 snak: the reference's is_nhle checks claim-KEY
    # presence (model.py:1116-1118), so this must still flag as NHLE
    novalue_nhle = {
        "id": "Q77",
        "labels": {"en": {"language": "en", "value": "Novalue Hall"}},
        "claims": {"P1216": [{"mainsnak": {"snaktype": "novalue"}}]},
    }
    payload = json.dumps(
        {"entities": {"Q42": _ENTITY, "Q999": {"id": "Q999", "missing": ""},
                      "Q77": novalue_nhle}}
    )
    df = spark.createDataFrame([(payload,)], "payload string")
    rows = {r["qid"]: r for r in parse_wbgetentities(df).collect()}
    assert set(rows) == {"Q42", "Q999", "Q77"}
    assert rows["Q77"]["is_nhle"] is True
    e = rows["Q42"]
    assert e["label_en"] == "Adams Building"
    assert e["instanceof"] == ["Q41176"]
    assert e["is_nhle"] is True
    assert e["street_address"] == "1 Main St"
    assert (e["lat"], e["lon"]) == (51.5, -0.1)
    assert not e["missing"]
    # the raw document survives for the F2 name-assembly UDF
    assert json.loads(e["entity_json"])["labels"]["en"]["value"] == "Adams Building"
    missing = rows["Q999"]
    assert missing["missing"] and missing["entity_json"] is None


def test_wbgetentities_feeds_names_udf(spark):
    """entity_json plugs straight into names_from_entity_udf (F2)."""
    from pyspark.sql import functions as F

    from osm_wikidata_spark.functions.udfs import names_from_entity_udf

    payload = json.dumps({"entities": {"Q42": _ENTITY}})
    df = parse_wbgetentities(
        spark.createDataFrame([(payload,)], "payload string")
    ).filter("NOT missing")
    names = {
        r["e"]["name"]
        for r in df.select(
            F.explode(names_from_entity_udf("entity_json")).alias("e")
        ).collect()
    }
    assert "Adams Building" in names and "The Adams" in names


def test_wbgetentities_dir_and_cached_entity_files(spark, tmp_path):
    """Directory load handles both response bodies and bare cached entity
    files (wikidata_api.py:231-249) without a driver-side loop."""
    d = os.path.join(str(tmp_path), "landing")
    os.makedirs(d)
    with open(os.path.join(d, "resp.json"), "w") as fh:
        json.dump({"entities": {"Q42": _ENTITY}}, fh)
    with open(os.path.join(d, "Q7.json"), "w") as fh:  # bare cache file
        json.dump({"id": "Q7", "labels": {"en": {"language": "en", "value": "Seven"}}}, fh)
    rows = {r["qid"]: r for r in read_wbgetentities_dir(spark, d).collect()}
    assert set(rows) == {"Q42", "Q7"}
    assert rows["Q7"]["label_en"] == "Seven"
    assert rows["Q7"]["instanceof"] == []


def test_extracts_skip_semantics(spark):
    payload = json.dumps(
        {
            "query": {
                "pages": [
                    {"pageid": 1, "ns": 0, "title": "Kept",
                     "extract": "<p>The <b>Kept</b> one.</p>"},
                    {"pageid": 2, "ns": 0, "title": "NoExtract", "missing": True},
                    {"pageid": 3, "ns": 0, "title": "Blank", "extract": " \n\t "},
                ]
            }
        }
    )
    df = spark.createDataFrame([(payload,)], "payload string")
    out = extract_bold_names(parse_extracts(df)).collect()
    assert [(r["title"], r["names"]) for r in out] == [("Kept", ["Kept"])]


def test_extracts_dir(spark, tmp_path):
    d = os.path.join(str(tmp_path), "extracts")
    os.makedirs(d)
    for i in range(3):
        with open(os.path.join(d, f"r{i}.json"), "w") as fh:
            json.dump(
                {"query": {"pages": [
                    {"pageid": i, "ns": 0, "title": f"T{i}",
                     "extract": f"<p><b>T{i}</b> intro.</p>"}
                ]}},
                fh,
            )
    rows = sorted(
        (r["title"], r["names"][0])
        for r in extract_bold_names(read_extracts_dir(spark, d)).collect()
    )
    assert rows == [("T0", "T0"), ("T1", "T1"), ("T2", "T2")]


# ---------------------------------------------------------------------------
# sources/catalog.py: table-reference resolution (Iceberg gated, parquet
# fallback — SURVEY.md risk register "Iceberg in sandbox")


def test_catalog_parquet_roundtrip(spark, tmp_path):
    from osm_wikidata_spark.sources.catalog import read_table, write_table

    path = os.path.join(str(tmp_path), "tbl")
    df = spark.range(10).withColumnRenamed("id", "n")
    write_table(df, path, mode="overwrite")
    assert read_table(spark, path).count() == 10
    write_table(df, path, mode="append")
    assert read_table(spark, path).count() == 20


def test_catalog_parquet_partitioned_write(spark, tmp_path):
    from pyspark.sql import functions as F

    from osm_wikidata_spark.sources.catalog import read_table, write_table

    path = os.path.join(str(tmp_path), "part_tbl")
    df = spark.range(8).select("id", (F.col("id") % 2).alias("p"))
    write_table(df, path, mode="overwrite", partition_by=["p"])
    assert os.path.isdir(os.path.join(path, "p=0"))
    assert read_table(spark, path).count() == 8


def test_catalog_iceberg_gated_in_sandbox(spark, tmp_path):
    """No Iceberg jar here: the probe reports it, an iceberg: ref raises
    a descriptive error instead of an opaque ClassNotFound, and time
    travel on a parquet path is rejected."""
    import pytest

    from osm_wikidata_spark.sources.catalog import (
        iceberg_available,
        iceberg_configs,
        read_table,
    )

    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        read_table(spark, "iceberg:local.db.transcripts")
    with pytest.raises(ValueError, match="time travel"):
        read_table(spark, str(tmp_path), snapshot_id=123)
    confs = iceberg_configs(catalog="c1", warehouse="/w")
    assert confs["spark.sql.catalog.c1"] == "org.apache.iceberg.spark.SparkCatalog"
    assert confs["spark.sql.catalog.c1.warehouse"] == "/w"

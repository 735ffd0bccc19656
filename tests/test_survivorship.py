"""Survivorship rules (operators/survivorship.py): per-rule semantics,
deterministic tie-breaks, null handling."""

from __future__ import annotations

import pytest

from osm_wikidata_spark.operators.survivorship import golden_records


def _rows(spark, data):
    return spark.createDataFrame(
        data, "cluster string, seg string, name string, bal double"
    )


def test_rules_and_tiebreaks(spark):
    df = _rows(
        spark,
        [
            # cluster a: mode seg = 'x' (2 vs 1); longest name 'longest-name';
            # max bal 9.0
            ("a", "x", "short", 1.0),
            ("a", "x", "longest-name", 9.0),
            ("a", "y", "mid-name", 3.0),
            # cluster b: seg tie x/y 1-1 → smallest value 'x' wins;
            # name-length tie → lexicographically larger wins
            ("b", "y", "aaa", 2.0),
            ("b", "x", "zzz", 2.0),
        ],
    )
    got = {
        r["cluster"]: r
        for r in golden_records(
            df, "cluster", {"seg": "mode", "name": "longest", "bal": "max"}
        ).collect()
    }
    a, b = got["a"], got["b"]
    assert (a["n_records"], a["seg"], a["name"], a["bal"]) == (
        3, "x", "longest-name", 9.0,
    )
    assert (b["seg"], b["name"], b["bal"]) == ("x", "zzz", 2.0)


def test_mode_ignores_nulls_and_all_null_cluster(spark):
    df = _rows(
        spark,
        [
            ("a", None, "n1", 1.0),
            ("a", None, "n2", 2.0),
            ("a", "y", "n3", 3.0),  # single non-null beats two nulls
            ("c", None, "n4", 4.0),
        ],
    )
    got = {
        r["cluster"]: r
        for r in golden_records(df, "cluster", {"seg": "mode"}).collect()
    }
    assert got["a"]["seg"] == "y"
    assert got["c"]["seg"] is None  # all-null cluster survives as null


def test_min_rule_and_unknown_rule_rejected(spark):
    df = _rows(spark, [("a", "x", "n", 5.0), ("a", "y", "m", 2.0)])
    got = golden_records(df, "cluster", {"bal": "min"}).first()
    assert got["bal"] == 2.0
    with pytest.raises(ValueError):
        golden_records(df, "cluster", {"bal": "median"})


def test_deterministic_under_repartition(spark):
    data = [
        ("a", ["x", "y"][i % 2], f"name-{i:02d}", float(i)) for i in range(20)
    ]
    df = _rows(spark, data)
    rules = {"seg": "mode", "name": "longest", "bal": "max"}
    r1 = sorted(map(tuple, golden_records(df, "cluster", rules).collect()))
    r2 = sorted(
        map(
            tuple,
            golden_records(df.repartition(7, "name"), "cluster", rules).collect(),
        )
    )
    assert r1 == r2

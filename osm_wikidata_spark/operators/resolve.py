"""Per-group selection / one-to-one resolution (SURVEY.md §2.6 A1, §2.7 G*).

The reference shrinks each entity's candidate list with ordered preference
rules and finally vetoes any record claimed by several entities
(`/root/reference/matcher/matcher.py:1399-1481`).  Here the same semantics
are window functions over the edge DataFrame — one shuffle per rule family
instead of a per-entity Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def multi_match_veto(
    edges: DataFrame, record_col: str = "right_id"
) -> DataFrame:
    """Drop records matched by more than one entity (A1; the 1:1 core,
    matcher.py:1429-1441).  One groupBy-count + join-back."""
    counts = edges.groupBy(record_col).agg(F.count("*").alias("claims"))
    return (
        edges.join(counts, record_col)
        .filter(F.col("claims") == 1)
        .drop("claims")
    )


def prefer_unique(
    edges: DataFrame,
    group_col: str,
    preferred: F.Column,
) -> DataFrame:
    """Keep only the preferred candidate when a group has exactly one
    (G2/G3/G5 pattern, matcher.py:1509-1539): a window count of qualifying
    rows; groups with exactly one preferred row shrink to it, others pass
    through unchanged."""
    w = Window.partitionBy(group_col)
    flagged = edges.withColumn("__pref", preferred.cast("int"))
    counted = flagged.withColumn("__n_pref", F.sum("__pref").over(w))
    return (
        counted.filter((F.col("__n_pref") != 1) | (F.col("__pref") == 1))
        .drop("__pref", "__n_pref")
    )


def filter_distant(
    edges: DataFrame,
    group_col: str,
    score_col: str,
    near: float,
    far: float,
) -> DataFrame:
    """G1 analog (matcher.py:1567-1582): if a group's best score is ≥``near``
    and every other candidate is ≤``far``, keep only the best.  Scores play
    the role of (inverse) distance in the graft."""
    w = Window.partitionBy(group_col)
    ranked = (
        edges.withColumn("__max", F.max(score_col).over(w))
        .withColumn(
            "__n_far",
            F.sum(
                F.when(
                    (F.col(score_col) < F.col("__max")) & (F.col(score_col) > far), 1
                ).otherwise(0)
            ).over(w),
        )
    )
    keep_single = (F.col("__max") >= near) & (F.col("__n_far") == 0)
    return (
        ranked.filter(~keep_single | (F.col(score_col) == F.col("__max")))
        .drop("__max", "__n_far")
    )


def resolve_one_to_one(
    edges: DataFrame,
    entity_col: str = "left_id",
    record_col: str = "right_id",
    rank_col: str = "score",
) -> DataFrame:
    """Full 1:1 resolution: best candidate per entity (rank window, K1
    pattern), then the multi-claim veto (A1).  Deterministic tiebreak on the
    record id."""
    w = Window.partitionBy(entity_col).orderBy(
        F.col(rank_col).desc(), F.col(record_col)
    )
    best = (
        edges.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    return multi_match_veto(best, record_col)

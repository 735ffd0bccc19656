"""Pair-level veto stage (SURVEY.md §2.8 V1-V6).

The reference hard-codes ~20 "X must not match Y" guards inside its
candidate loop (matcher.py:360-558, 694-880) plus a data-driven
``BadMatchFilter`` table (model.py:1462-1497).  The engine generalises all
of them into ONE shape: a broadcast rule table of incompatible
(left-attribute, right-attribute) pairs applied as a single filter over the
scored pair DataFrame — plus threshold guards as plain column predicates.

Rule semantics (mirroring BadMatchFilter.check): a rule
``(left_attr, right_attr)`` vetoes a pair when the left side carries
``left_attr``, the right side carries ``right_attr``, and the right side
does NOT also carry ``left_attr`` (carrying the expected attribute
overrides the veto — matcher.py:1489-1497).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# defaults distilled from the reference's hard-coded guards
# (matcher.py:475-558): left = entity expectation, right = record attribute
DEFAULT_VETO_RULES: list[tuple[str, str]] = [
    ("amenity=post_office", "amenity=place_of_worship"),
    ("building=stable", "building=house"),
    ("man_made=tower", "amenity=pub"),
    ("historic=castle", "railway=station"),
    ("railway=station", "amenity=cafe"),
    ("railway=station", "shop=supermarket"),
    ("amenity=fuel", "shop=convenience"),
    ("place", "railway"),
]


def veto_rules_table(
    spark: SparkSession, rules: list[tuple[str, str]] | None = None
) -> DataFrame:
    return spark.createDataFrame(
        rules or DEFAULT_VETO_RULES, "left_attr string, right_attr string"
    )


def apply_vetoes(
    pairs: DataFrame,
    rules: DataFrame,
    left_attrs_col: str = "left_attrs",
    right_attrs_col: str = "right_attrs",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Filter out pairs hit by any incompatibility rule.

    ``pairs`` carries attribute arrays for both sides.  With ``id_cols``
    (the pair identity, e.g. ``["left_id", "right_id"]``) the veto is a
    broadcast join to find hits and a left-anti join back — duplicate-row
    safe (``exceptAll`` against a deduplicated hit set would leave extra
    occurrences of a vetoed duplicate row alive).  Without ``id_cols`` the
    rule table — broadcast-sized by definition — is collected and compiled
    into one row predicate: no join at all.
    """
    if id_cols is None:
        collected = [(r["left_attr"], r["right_attr"]) for r in rules.collect()]
        return apply_vetoes_expr(pairs, collected, left_attrs_col, right_attrs_col)
    hit = (
        pairs.join(
            F.broadcast(rules),
            F.array_contains(F.col(left_attrs_col), F.col("left_attr"))
            & F.array_contains(F.col(right_attrs_col), F.col("right_attr"))
            & ~F.array_contains(F.col(right_attrs_col), F.col("left_attr")),
        )
        .select(id_cols)
        .dropDuplicates(id_cols)
    )
    return pairs.join(hit, id_cols, "left_anti")


def apply_vetoes_expr(
    pairs: DataFrame,
    rules: list[tuple[str, str]],
    left_attrs_col: str = "left_attrs",
    right_attrs_col: str = "right_attrs",
) -> DataFrame:
    """Same semantics as :func:`apply_vetoes` but compiled into one column
    predicate (no join at all) — right choice when the rule list is small
    and static, as in the reference."""
    veto = F.lit(False)
    for left_attr, right_attr in rules:
        veto = veto | (
            F.array_contains(F.col(left_attrs_col), left_attr)
            & F.array_contains(F.col(right_attrs_col), right_attr)
            & ~F.array_contains(F.col(right_attrs_col), left_attr)
        )
    return pairs.filter(~veto)


def distance_guard(
    pairs: DataFrame,
    score_col: str = "score",
    kind_col: str = "kind",
    thresholds: dict[str, float] | None = None,
    default: float = 0.5,
) -> DataFrame:
    """Per-kind minimum-score guard — the graft analog of the reference's
    per-type max distances (get_max_dist, model.py:1392-1413: 2000 m place /
    1000 m peak / 100 m NHLE / 500 m default, inverted to scores here)."""
    thresholds = thresholds or {}
    limit = F.lit(default)
    for kind, value in thresholds.items():
        limit = F.when(F.col(kind_col) == kind, F.lit(value)).otherwise(limit)
    return pairs.filter(F.col(score_col) >= limit)

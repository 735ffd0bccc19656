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
    matcher.py:1429-1441).  One partition-window count — the same
    one-exchange shape as :func:`prefer_unique` and the CC star passes
    (a groupBy + join-back would shuffle the edge table twice).

    NULL record ids are dropped explicitly: they cannot claim a 1:1
    match (the former join-back shape dropped them as a side effect of
    inner-join key semantics; the window would otherwise pool all NULLs
    into one partition and keep a lone NULL-key edge)."""
    w = Window.partitionBy(record_col)
    return (
        edges.filter(F.col(record_col).isNotNull())
        .withColumn("__claims", F.count("*").over(w))
        .filter(F.col("__claims") == 1)
        .drop("__claims")
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


def final_gate(
    cands: DataFrame,
    reduced: DataFrame | None = None,
    bad_item_ids: DataFrame | None = None,
    ignore_existing: bool = False,
    group_col: str = "item_id",
    record_cols: list[str] | None = None,
) -> DataFrame:
    """G11: the reference's upload gate (``filter_candidates_more``,
    matcher.py:1429-1481) with its exact note strings.

    ``cands`` is the RAW candidate table; ``reduced`` the output of
    :func:`osm_wikidata_spark.operators.reduce.reduce_candidates` (defaults
    to ``cands``).  Mirroring the reference, the digit checks and the
    multi-claim count run over the RAW candidates, the single-candidate
    check over the REDUCED set.  Returns one row per reduced candidate with
    a ``note`` column — null on exactly the rows that may upload:

    1. item has a human bad-match report   → 'has bad match'
    2. any raw candidate housename numeric → 'number as house name'
    3. any raw candidate name numeric      → 'number as name'
    4. more than one reduced candidate     → 'more than one candidate found'
    5. record claimed by several items     → 'OSM candidate matches multiple Wikidata items'
    6. candidate already tagged            → 'candidate already tagged'

    ``record_cols`` is the record identity — default ``[osm_type, osm_id]``
    like the reference's ``osm_count`` key: OSM ids are only unique per
    type, so counting claims on ``osm_id`` alone would conflate a node and
    a way that share a numeric id.

    Documented divergence: the reference iterates raw candidates and yields
    whichever digit check hits first PER CANDIDATE (matcher.py:1452-1462),
    so with one digit-housename candidate and another digit-name candidate
    the reference's note depends on candidate order; this gate gives
    'number as house name' deterministic priority.  Both paths still
    reject — only the note string can differ.  The digit class is
    ``\\p{Nd}`` (Unicode decimal digits) to match Python ``str.isdigit``
    on all real OSM values (isdigit additionally accepts superscripts and
    a few Numeric_Type=Digit code points that do not occur as house
    numbers).
    """
    record_cols = record_cols or ["osm_type", "osm_id"]
    reduced = reduced if reduced is not None else cands
    tags = F.col("tags")
    housename_digit = F.coalesce(
        F.element_at(tags, "addr:housename").rlike(r"^\p{Nd}+$"), F.lit(False)
    )
    name_digit = F.coalesce(
        F.element_at(tags, "name").rlike(r"^\p{Nd}+$"), F.lit(False)
    )

    raw_flags = cands.groupBy(group_col).agg(
        F.max(housename_digit.cast("int")).alias("__any_hn_digit"),
        F.max(name_digit.cast("int")).alias("__any_name_digit"),
    )
    claims = cands.groupBy(record_cols).agg(F.count("*").alias("__claims"))

    w = Window.partitionBy(group_col)
    flagged = (
        reduced.withColumn("__n", F.count("*").over(w))
        .join(raw_flags, group_col)
        .join(claims, record_cols)
    )
    if bad_item_ids is not None:
        flagged = flagged.join(
            F.broadcast(
                bad_item_ids.select(F.col(group_col))
                .dropDuplicates([group_col])  # one report per item is enough
                .withColumn("__bad", F.lit(1))
            ),
            group_col,
            "left",
        )
    else:
        flagged = flagged.withColumn("__bad", F.lit(None).cast("int"))

    note = (
        F.when(F.col("__bad").isNotNull(), "has bad match")
        .when(F.col("__any_hn_digit") == 1, "number as house name")
        .when(F.col("__any_name_digit") == 1, "number as name")
        .when(F.col("__n") > 1, "more than one candidate found")
        .when(
            F.col("__claims") > 1, "OSM candidate matches multiple Wikidata items"
        )
    )
    if not ignore_existing:
        note = note.when(
            F.map_contains_key(tags, "wikidata"), "candidate already tagged"
        )
    return flagged.withColumn("note", note).drop(
        "__n", "__any_hn_digit", "__any_name_digit", "__bad", "__claims"
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

"""Per-type candidate-reduction rules (SURVEY.md §2.7 G2-G10).

The reference shrinks each item's candidate list with an ordered family of
type-specific preference rules, applied at generation time
(`/root/reference/matcher/matcher.py:907-917`) and again at display time via
``reduce_candidates`` (matcher.py:1399-1426).  Round 1 covered only the
generic "keep the unique preferred candidate" window; this module ports each
rule's *specific* predicate, faithfully to the reference tests
(`/root/reference/tests/test_matcher.py:1043-1095` pins G4).

Candidate-table contract (one row per (item, candidate) edge):

    item_id        group key (the Wikidata-item analog)
    osm_type       'node' | 'way' | 'relation'
    osm_id         candidate id
    name           candidate display name (nullable)
    dist           distance in metres (the reference's spatial score)
    tags           map<string,string>  — raw candidate tags
    matching_tags  array<string>       — output of find_matching_tags (M7)
    name_match     boolean             — candidate has any name match

Every rule is a window expression over ``item_id`` — one shuffle for the
whole family (Catalyst collapses same-key windows), versus the reference's
per-item Python loop.  All rules are no-ops on groups that don't satisfy
their guard, so they compose by chaining.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_BUILDING_ONLY_TAGS = ("building", "building=yes", "historic:building")


def is_building_only(matching_tags: Column) -> Column:
    """matching_tags ⊆ {building, building=yes, historic:building}
    (matcher.py:469-472; empty set is building-only, like set.issubset)."""
    return F.forall(matching_tags, lambda t: t.isin(*_BUILDING_ONLY_TAGS))


def _keep_unique_preferred(
    cands: DataFrame,
    preferred: Column,
    others_ok: Column,
    group_col: str = "item_id",
    min_group: int = 2,
) -> DataFrame:
    """The shared shape of G2/G3/G5/G9: shrink a group to its single
    ``preferred`` candidate iff exactly one is preferred and every other
    candidate satisfies ``others_ok``; otherwise the group passes unchanged.
    """
    w = Window.partitionBy(group_col)
    # withColumns (plural): each withColumn re-analyzes the whole plan,
    # and this rule family chains ~10 rules — batching the projections
    # keeps plan-build time linear in the rule count (measured on
    # q_reduce_candidates: see OPTIMIZATION_r06.md)
    flagged = cands.withColumns(
        {
            "__pref": preferred.cast("int"),
            "__other_bad": (~preferred & ~others_ok).cast("int"),
        }
    )
    counted = flagged.withColumns(
        {
            "__n": F.count("*").over(w),
            "__n_pref": F.sum("__pref").over(w),
            "__n_bad": F.sum("__other_bad").over(w),
        }
    )
    shrink = (
        (F.col("__n") >= min_group)
        & (F.col("__n_pref") == 1)
        & (F.col("__n_bad") == 0)
    )
    return counted.filter(~shrink | (F.col("__pref") == 1)).drop(
        "__pref", "__other_bad", "__n", "__n_pref", "__n_bad"
    )


# --------------------------------------------------------------- G4


def prefer_tag_match_over_building_only_match(
    cands: DataFrame, group_col: str = "item_id"
) -> DataFrame:
    """G4 (matcher.py:939-962; pinned by tests/test_matcher.py:1043-1095).

    Candidates with a name match AND a non-building-only tag match beat
    building-only matches — UNLESS every good candidate is >100 m away and
    some building-only one is <10 m (the nearby building is then correct).
    """
    w = Window.partitionBy(group_col)
    good = F.col("name_match") & ~is_building_only(F.col("matching_tags"))
    flagged = cands.withColumn("__good", good.cast("int"))
    counted = flagged.withColumns(
        {
            "__n": F.count("*").over(w),
            "__n_good": F.sum("__good").over(w),
            "__min_good_dist": F.min(
                F.when(F.col("__good") == 1, F.col("dist"))
            ).over(w),
            "__min_less_dist": F.min(
                F.when(F.col("__good") == 0, F.col("dist"))
            ).over(w),
        }
    )
    nearby_building_exception = (F.col("__min_good_dist") > 100) & (
        F.col("__min_less_dist") < 10
    )
    shrink = (
        (F.col("__n") > 1)
        & (F.col("__n_good") >= 1)
        & (F.col("__n_good") < F.col("__n"))
        & ~nearby_building_exception
    )
    return counted.filter(~shrink | (F.col("__good") == 1)).drop(
        "__good", "__n", "__n_good", "__min_good_dist", "__min_less_dist"
    )


# --------------------------------------------------------------- G3 / G5


def prefer_key_over_building(
    cands: DataFrame, key: str, group_col: str = "item_id"
) -> DataFrame:
    """G3 (matcher.py:1484-1502): a unique ``key=*`` tag match beats
    candidates whose only matching tag is a building tag."""
    mt = F.col("matching_tags")
    preferred = F.exists(mt, lambda t: t.startswith(key + "="))
    # F.get, not mt[0]: the subscript would be guarded only by the AND's
    # evaluation order (size == 1 first), which the optimizer is free to
    # reorder — and under ANSI mode an out-of-bounds subscript on an
    # empty matching_tags array is a hard job failure.  get() returns
    # NULL out of bounds; NULL & ... stays falsy for the keep decision.
    others_ok = (F.size(mt) == 1) & F.get(mt, 0).startswith("building")
    return _keep_unique_preferred(cands, preferred, others_ok, group_col)


def prefer_railway_station(
    cands: DataFrame, group_col: str = "item_id"
) -> DataFrame:
    """G5 (matcher.py:1542-1564): a unique railway=station match beats
    tram stops / depots / railway landuse / station buildings / stop
    positions."""
    mt = F.col("matching_tags")
    preferred = F.array_contains(mt, "railway=station")
    others_ok = (
        F.array_contains(mt, "railway=tram_stop")
        | F.array_contains(mt, "railway=depot")
        | F.array_contains(mt, "landuse=railway")
        | F.array_contains(mt, "building=train_station")
        | F.array_contains(mt, "public_transport=stop_position")
    )
    return _keep_unique_preferred(cands, preferred, others_ok, group_col)


# --------------------------------------------------------------- G2


def prefer_proper_name_match(
    cands: DataFrame,
    proper: Column,
    housename_or_operator: Column,
    group_col: str = "item_id",
) -> DataFrame:
    """G2 (matcher.py:1509-1539): prefer the unique candidate matching on
    ``name``/``name:*`` (not image-only), provided every other candidate
    matched only via addr:housename / operator.

    ``proper`` and ``housename_or_operator`` are caller-supplied predicates
    over the candidate's name-match detail (the detail encoding is
    pipeline-specific; matcher.py derives them from the name_match dict and
    ``image_only_match``, matcher.py:1505-1506).
    """
    return _keep_unique_preferred(cands, proper, housename_or_operator, group_col)


# --------------------------------------------------------------- G6


def prefer_stop_area_relation(
    cands: DataFrame, expected_tags_col: str = "expected_tags",
    group_col: str = "item_id",
) -> DataFrame:
    """G6 (matcher.py:920-936): for items expected to be a
    public_transport=stop_area, prefer stop_area *relations* to their stop
    and platform members (keep all stop-area relations, not just one)."""
    w = Window.partitionBy(group_col)
    is_stop_area = (F.col("osm_type") == "relation") & (
        F.element_at(F.col("tags"), "public_transport") == F.lit("stop_area")
    )
    flagged = cands.withColumn(
        "__sa", F.coalesce(is_stop_area, F.lit(False)).cast("int")
    )
    counted = flagged.withColumns(
        {"__n": F.count("*").over(w), "__n_sa": F.sum("__sa").over(w)}
    )
    shrink = (
        (F.col("__n") >= 2)
        # coalesce: NULL expected_tags (item absent from the dim) must
        # make shrink FALSE so the group passes through untouched — a
        # bare NULL here would null the keep filter and silently drop
        # every non-stop-area candidate in the group
        & F.coalesce(
            F.array_contains(
                F.col(expected_tags_col), "public_transport=stop_area"
            ),
            F.lit(False),
        )
        & (F.col("__n_sa") >= 1)
    )
    return counted.filter(~shrink | (F.col("__sa") == 1)).drop(
        "__sa", "__n", "__n_sa"
    )


# --------------------------------------------------------------- G7

_FARMHOUSE_PATTERN = r"^(.*) farm ?house$"  # matcher.py:56 (re.I)


def prefer_farmhouse(
    cands: DataFrame,
    group_col: str = "item_id",
    farmhouse_flag: str | None = None,
) -> DataFrame:
    """G7 (matcher.py:965-983): in a 2-candidate group where the longer name
    is "X Farm House" and the shorter is "X" or "X house", keep the
    farmhouse.  The reference applies this only to farmhouse items
    (``item.is_farmhouse()``, matcher.py:913-914); pass ``farmhouse_flag``
    naming a per-item boolean column to reproduce that gate (null counts as
    False)."""
    w = Window.partitionBy(group_col)
    order_key = F.struct(F.length("name"), F.col("name"))
    counted = cands.withColumns(
        {
            "__n": F.count("*").over(w),
            # the reference bails on falsy names ('not c.get("name")',
            # matcher.py:968-970): empty string counts as unnamed too
            "__n_unnamed": F.sum(
                (F.col("name").isNull() | (F.col("name") == "")).cast("int")
            ).over(w),
            "__house_name": F.lower(F.min_by("name", order_key).over(w)),
            "__farm_name": F.lower(F.max_by("name", order_key).over(w)),
        }
    )
    farm_start = F.regexp_extract(F.col("__farm_name"), _FARMHOUSE_PATTERN, 1)
    shrink = (
        (F.col("__n") == 2)
        & (F.col("__n_unnamed") == 0)
        & F.col("__farm_name").rlike(_FARMHOUSE_PATTERN)
        & (
            (F.col("__house_name") == farm_start)
            | (F.col("__house_name") == F.concat(farm_start, F.lit(" house")))
        )
    )
    if farmhouse_flag is not None:
        shrink = shrink & F.coalesce(F.col(farmhouse_flag), F.lit(False))
    keep_farm = F.lower(F.col("name")) == F.col("__farm_name")
    return counted.filter(~shrink | keep_farm).drop(
        "__n", "__n_unnamed", "__house_name", "__farm_name"
    )


# --------------------------------------------------------------- G8


def filter_bridge(
    cands: DataFrame,
    group_col: str = "item_id",
    bridge_flag: str | None = None,
) -> DataFrame:
    """G8 (matcher.py:986-992): when a man_made=bridge candidate exists,
    drop candidates that are merely *on* the bridge (bridge=yes without
    man_made).  The reference applies this only to items expected to be
    bridges (``'man_made=bridge' in item.tags``, matcher.py:915-916); pass
    ``bridge_flag`` naming that per-item boolean column to reproduce the
    gate (null counts as False)."""
    w = Window.partitionBy(group_col)
    has_bridge = F.max(
        (
            F.coalesce(
                F.element_at(F.col("tags"), "man_made") == "bridge", F.lit(False)
            )
        ).cast("int")
    ).over(w)
    keep = F.map_contains_key(F.col("tags"), "man_made") | ~F.map_contains_key(
        F.col("tags"), "bridge"
    )
    drop_applies = F.col("__hb") == 1
    if bridge_flag is not None:
        drop_applies = drop_applies & F.coalesce(F.col(bridge_flag), F.lit(False))
    return (
        cands.withColumn("__hb", has_bridge)
        .filter(~drop_applies | keep)
        .drop("__hb")
    )


# --------------------------------------------------------------- G9


def filter_schools(cands: DataFrame, group_col: str = "item_id") -> DataFrame:
    """G9a (matcher.py:1290-1309): keep the unique amenity=school when every
    other candidate's matching tags are exactly [building=school]."""
    mt = F.col("matching_tags")
    preferred = F.array_contains(mt, "amenity=school")
    others_ok = F.array_sort(mt) == F.array(F.lit("building=school"))
    return _keep_unique_preferred(cands, preferred, others_ok, group_col)


def filter_churches(cands: DataFrame, group_col: str = "item_id") -> DataFrame:
    """G9b (matcher.py:1312-1334): keep the unique amenity=place_of_worship
    when every other candidate's matching tags are exactly
    [religion=christian]."""
    mt = F.col("matching_tags")
    preferred = F.array_contains(mt, "amenity=place_of_worship")
    others_ok = F.array_sort(mt) == F.array(F.lit("religion=christian"))
    return _keep_unique_preferred(cands, preferred, others_ok, group_col)


def filter_station(cands: DataFrame, group_col: str = "item_id") -> DataFrame:
    """G9c (matcher.py:1337-1362), two branches in reference order:

    1. exactly one railway=station match and tram_stop matches + 1 == group
       size (the reference counts tram stops over ALL candidates) → keep the
       station;
    2. else: unique public_transport=station where every other candidate
       matches railway=tram_stop → keep it.
    """
    w = Window.partitionBy(group_col)
    mt = F.col("matching_tags")
    is_station = F.array_contains(mt, "railway=station")
    is_tram = F.array_contains(mt, "railway=tram_stop")
    is_pt = F.array_contains(mt, "public_transport=station")
    flagged = cands.withColumns(
        {
            "__st": is_station.cast("int"),
            "__tr": is_tram.cast("int"),
            "__pt": is_pt.cast("int"),
        }
    )
    counted = flagged.withColumns(
        {
            "__n": F.count("*").over(w),
            "__n_st": F.sum("__st").over(w),
            "__n_tr": F.sum("__tr").over(w),
            "__n_pt": F.sum("__pt").over(w),
            "__n_pt_bad": F.sum((~is_pt & ~is_tram).cast("int")).over(w),
        }
    )
    branch1 = (
        (F.col("__n") >= 2)
        & (F.col("__n_st") == 1)
        & (F.col("__n_tr") + 1 == F.col("__n"))
    )
    branch2 = (
        (F.col("__n") >= 2)
        & ~branch1
        & (F.col("__n_pt") == 1)
        & (F.col("__n_pt_bad") == 0)
    )
    keep = (
        F.when(branch1, F.col("__st") == 1)
        .when(branch2, F.col("__pt") == 1)
        .otherwise(F.lit(True))
    )
    return counted.filter(keep).drop(
        "__st", "__tr", "__pt", "__n", "__n_st", "__n_tr", "__n_pt", "__n_pt_bad"
    )


def filter_building(
    cands: DataFrame, group_col: str = "item_id", gate: F.Column | None = None
) -> DataFrame:
    """G9d (matcher.py:1365-1383): prefer the single building *way* over
    nodes representing current uses of the building.  Applied only to items
    that primarily represent buildings (see :func:`reduce_candidates`).

    ``gate`` (optional) ANDs an item-level condition into the shrink
    predicate.  It MUST be constant within a ``group_col`` group (it is an
    item property in the reference) — gating the predicate instead of
    splitting the stream into filter/union branches keeps the rule chain
    one linear pipeline over a single hash partitioning (2 fewer shuffles
    in reduce_candidates' executed plan)."""
    w = Window.partitionBy(group_col)
    is_way = F.col("osm_type") == "way"
    is_node = F.col("osm_type") == "node"
    counted = cands.withColumns(
        {
            "__n": F.count("*").over(w),
            "__n_way": F.sum(is_way.cast("int")).over(w),
            "__n_node": F.sum(is_node.cast("int")).over(w),
            "__way_building": F.max(
                (is_way & F.map_contains_key(F.col("tags"), "building")).cast("int")
            ).over(w),
        }
    )
    shrink = (
        (F.col("__n") >= 2)
        & (F.col("__n_way") == 1)
        & (F.col("__n_node") + 1 == F.col("__n"))
        & (F.col("__way_building") == 1)
    )
    if gate is not None:
        shrink = shrink & gate
    return counted.filter(~shrink | is_way).drop(
        "__n", "__n_way", "__n_node", "__way_building"
    )


def filter_reservoir(
    cands: DataFrame, group_col: str = "item_id", gate: F.Column | None = None
) -> DataFrame:
    """G9e (matcher.py:1386-1396): reservoirs — the single way beats nodes.
    ``gate``: see :func:`filter_building` (must be group-constant)."""
    w = Window.partitionBy(group_col)
    is_way = F.col("osm_type") == "way"
    is_node = F.col("osm_type") == "node"
    counted = cands.withColumns(
        {
            "__n": F.count("*").over(w),
            "__n_way": F.sum(is_way.cast("int")).over(w),
            "__n_node": F.sum(is_node.cast("int")).over(w),
        }
    )
    shrink = (
        (F.col("__n") >= 2)
        & (F.col("__n_way") == 1)
        & (F.col("__n_node") + 1 == F.col("__n"))
    )
    if gate is not None:
        shrink = shrink & gate
    return counted.filter(~shrink | is_way).drop("__n", "__n_way", "__n_node")


# --------------------------------------------------------------- G10


def reduce_candidates(
    cands: DataFrame,
    group_col: str = "item_id",
    building_flag: str | None = "is_primarily_building",
    reservoir_flag: str | None = "is_reservoir",
) -> DataFrame:
    """G10 (matcher.py:1399-1426): the display-time composition —
    schools → station → churches → building (items that primarily represent
    buildings) → reservoir (reservoir items).

    ``building_flag``/``reservoir_flag`` name per-item boolean columns (the
    reference's ``item.is_primarily_building()`` / ``item.is_reservoir()``,
    model.py:876-891, 870-871); pass None to skip a conditional rule.
    """
    out = filter_schools(cands, group_col)
    out = filter_station(out, group_col)
    out = filter_churches(out, group_col)
    if building_flag is not None:
        # coalesce: a NULL flag (item absent from the properties dim) means
        # "not primarily a building" — the rows must pass through, not
        # vanish.  The flag gates the shrink predicate instead of splitting
        # the stream into filter/union branches: the flag is item-level
        # (group-constant), so the semantics are identical, and the whole
        # G10 chain stays one linear pipeline over a single item_id hash
        # partitioning (2 Exchanges instead of 4 in the executed plan).
        out = filter_building(
            out, group_col, gate=F.coalesce(F.col(building_flag), F.lit(False))
        )
    if reservoir_flag is not None:
        out = filter_reservoir(
            out, group_col, gate=F.coalesce(F.col(reservoir_flag), F.lit(False))
        )
    return out


# --------------------------------------------------------------- G1 (exact)


def filter_distant_exact(cands: DataFrame, group_col: str = "item_id") -> DataFrame:
    """G1 with the reference's literal thresholds (matcher.py:1567-1582):
    groups without place/admin_level candidates shrink to their single
    <50 m candidate iff every other candidate is ≥1000 m away.  (The
    score-space variant lives in resolve.filter_distant.)"""
    w = Window.partitionBy(group_col)
    has_place = F.max(
        (
            F.map_contains_key(F.col("tags"), "place")
            | F.map_contains_key(F.col("tags"), "admin_level")
        ).cast("int")
    ).over(w)
    near = F.col("dist") < 50
    mid = (F.col("dist") >= 50) & (F.col("dist") < 1000)
    counted = cands.withColumns(
        {
            "__place": has_place,
            "__n": F.count("*").over(w),
            "__n_near": F.sum(near.cast("int")).over(w),
            "__n_mid": F.sum(mid.cast("int")).over(w),
        }
    )
    shrink = (
        (F.col("__place") == 0)
        & (F.col("__n") >= 2)
        & (F.col("__n_near") == 1)
        & (F.col("__n_mid") == 0)
    )
    return counted.filter(~shrink | near).drop(
        "__place", "__n", "__n_near", "__n_mid"
    )

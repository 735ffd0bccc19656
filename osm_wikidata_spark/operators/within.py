"""Containment join — within-context names (SURVEY.md §2.5 J5).

The reference collects the names of place/tourism polygons *containing* a
candidate (``get_within_names``, `/root/reference/matcher/matcher.py:582-599`,
``st_contains``) and feeds them into ``check_for_match`` as extra
place_names.  The graft has no geometry: containment is an explicit
``container_id`` foreign key on the record (the analog of the spatial
predicate, resolved at ingest), so the operator is a plain broadcast-able
equi-join + name projection — no UDFs, one shuffle at most.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# F1 name-projection blacklist (match.py:74-82) — the single shared
# definition, so within-context names and record display names can
# never disagree on what counts as a name
from ..kernel.records import NON_NAME_KEYS as _NON_NAME_KEYS


def container_display_names(tags: F.Column) -> F.Column:
    """Values of the container's name-bearing tags (get_names semantics,
    match.py:956-962)."""
    names = F.map_filter(
        tags,
        lambda k, v: (k.contains("name") & ~k.isin(*_NON_NAME_KEYS))
        | (k == "operator"),
    )
    return F.map_values(names)


def within_names(
    records: DataFrame,
    containers: DataFrame,
    record_id_col: str = "record_id",
    container_fk_col: str = "container_id",
    container_id_col: str = "container_id",
    container_tags_col: str = "tags",
    broadcast_containers: bool = True,
) -> DataFrame:
    """(record_id, within_names) — names of each record's containing
    place/tourism contexts (matcher.py:582-599 semantics: containers must
    carry a place or tourism key; the record itself is excluded).

    Containers (admin areas, tourist sites) are small relative to records —
    broadcast by default; set ``broadcast_containers=False`` to let AQE
    decide when the container table is itself huge.
    """
    ctx = containers.filter(
        F.map_contains_key(F.col(container_tags_col), "place")
        | F.map_contains_key(F.col(container_tags_col), "tourism")
    ).select(
        F.col(container_id_col).alias("__container"),
        F.explode(container_display_names(F.col(container_tags_col))).alias("__name"),
    )
    if broadcast_containers:
        ctx = F.broadcast(ctx)
    joined = records.select(
        F.col(record_id_col).alias("record_id"),
        F.col(container_fk_col).alias("__container"),
    ).join(ctx, "__container")
    # self-exclusion (the reference's a.osm_id != b.osm_id guard,
    # matcher.py:593): when records double as containers, a record must not
    # contribute its own names; string-cast keeps the comparison legal
    # across id types, coalesce keeps rows whose comparison is null
    joined = joined.filter(
        F.coalesce(
            F.col("record_id").cast("string") != F.col("__container").cast("string"),
            F.lit(True),
        )
    )
    return joined.groupBy("record_id").agg(
        F.sort_array(F.collect_set("__name")).alias("within_names")
    )

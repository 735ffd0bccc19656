"""Deterministic synthetic transcript generator (BASELINE.json input_hint).

Produces the authoritative input shape::

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Each conversation is "about" one underlying entity drawn from
``VARIANT_GROUPS`` — name-variant clusters taken from the reference's
labeled fixtures (tests/fixtures.py), so ground-truth clusters are known by
construction: conversations whose embedded mention names sit in the same
group belong to the same entity cluster; different groups never match under
the global ``GLOBAL_ENDINGS`` trim set (verified by tests/test_generator.py
against the kernel itself).

Mentions are embedded in double quotes inside turn text, so the extraction
stage is a plain ``regexp_extract_all`` — the graft analog of the
reference's name projection (wikidata.py:934-1015).

Everything is generated Spark-side from ``spark.range`` + a broadcast
variant dimension: no driver-side loops, scales to arbitrary row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Name-variant groups: all intra-group pairs match under GLOBAL_ENDINGS,
# no cross-group pair does.  Sources cited per group (reference test line).
VARIANT_GROUPS: list[list[str]] = [
    ["St. Michael's Church", "Church Of St Michael"],               # :354-358
    ["Oxmoor Mall", "Oxmoor Center"],                               # :488-490
    ["Rainbow Grocery Coop", "Rainbow Grocery Cooperative",
     "RGC – Rainbow Grocery Coop"],                                 # :303,514-517
    ["Lake Number Ten", "Lake No. 10"],                             # :415-420
    ["HEB Center @ Cedar Park", "H-E-B Center at Cedar Park"],      # :455-459
    ["110 Livingston", "110 Livingston Street"],                    # :466
    ["Augustine Steward House", "Augustine Steward's House"],       # :439-443
    ["The Old Rectory", "The Rectory"],                             # :471
    ["Walton on the Hill", "Walton-on-the-Hill"],                   # :193-196
    ["Hôpital Saint-François d'Assise",
     "Hôpital Saint-François-d'Assise"],                            # :188-191
    ["Leeds Bradford International",
     "Leeds Bradford International Airport"],                       # :293-296
    ["Times Furnishing", "Times Furnishing Company Building"],      # :274
    ["Bishop Justus CofE School",
     "Bishop Justus Church of England School",
     "Bishop Justus CE School"],                                    # :530-537
    ["New York Skyports Incorporated Seaplane Base",
     "New York Skyports Inc. Seaplane Base"],                       # :285-287
    ["Boulder Railroad Depot (Historic)", "Boulder Railroad Depot"],  # :270-272
    ["Kunkelspass", "Кункелспас"],                                  # :260
    ["Tricketts Cross", "Trickett's Cross, Dorset"],                # :262
    ["Church and 18th Street", "Church Street & 18th Street"],      # :265
    ["St Peter & St Paul", "St Peter and St Paul, Bromley"],        # :281-283
    # singletons — hard negatives sharing block tokens with other groups
    ["Manhattan Community Board 1"],                                # :156-162
    ["Manhattan Community Board 11"],
    ["Boots"],                                                      # :1025-1029
    ["The Boot Inn"],
    ["Hall"],                                                       # :520-527
    ["Post Office"],
    ["17 Mill Lane"],                                               # :463
    ["1, Mill Lane"],
    ["Livingston"],                                                 # :467
    # per-entity-endings group: "academy" is NOT in GLOBAL_ENDINGS — the
    # pair only clusters when the pipeline derives endings per entity
    # (the reference mutates `endings` per item from IsA types,
    # matcher.py:641-656; our analog derives them from mention tokens)
    ["Greenfield Academy", "Greenfield"],
    ["Riverside Academy"],  # hard negative sharing the 'academy' ending
    # acronym-channel group: no shared token, no shared full name — only
    # the acro: blocking channel pairs these (initials rule, match.py:346-382)
    ["BAC", "Baryshnikov Arts Center"],                              # :303
    # place-context group (J5): only clusters via the place-strip retry
    # (match.py:708-719) fed by within-context names (matcher.py:582-599);
    # the kernel finds NO match without place_names={"Felbrigg"}
    ["Felbrigg Village Hall", "Village Hall"],
    # house-ending group: clusters only via the derived "house" trim ending
    # (the reference's trim_house=True house trim, matcher.py:1036-1046)
    ["Oakway House", "Oakway"],
    # hamlet singletons: hamlets do NOT get the house trim
    # (matcher.py:1036-1046 discards "house" when item.is_hamlet()) — these
    # two would wrongly merge if the hamlet gate were missing
    ["Nutbourne"],
    ["Nutbourne House"],
]

# Conversation-level place context (J5 analog of the reference's
# get_within_names containment scan, matcher.py:582-599): variant name →
# place name surfaced in the conversation's tool turns as «place».
PLACE_CONTEXT: dict[str, str] = {
    "Felbrigg Village Hall": "Felbrigg",
    "Village Hall": "Felbrigg",
}

# Variant names whose conversations are about a hamlet (item-side metadata,
# the analog of instanceof Q5084 → item.is_hamlet(), model.py; surfaced in
# tool turns as "kind: hamlet").
HAMLET_NAMES: set[str] = {"Nutbourne", "Nutbourne House"}

# Trim endings shared by the whole transcript domain (per-pair endings are an
# OSM-ism; the graft applies one curated set).
GLOBAL_ENDINGS: list[str] = [
    "church", "church of", "mall", "center", "airport",
    "international airport", "inn", "hall", "post office",
]

# Per-entity ending derivation: a token in an entity's mention names
# contributes type-specific trim endings — the graft analog of the
# reference's IsA-derived endings (model.py:455-468) and the per-item
# endings mutation inside the match loop (matcher.py:641-656).
ENDING_RULES: dict[str, list[str]] = {
    "academy": ["academy"],
    "seminary": ["seminary"],
    "college": ["college"],
    # the reference's check_for_match trims "house" by default
    # (trim_house=True, matcher.py:1036-1046); the pipeline analog derives
    # the ending from the entity's own tokens, and the hamlet gate in
    # score_pairs removes it again for hamlet entities
    "house": ["house"],
}

_TEMPLATES = [
    'I was reading about "{}" yesterday, can you find details?',
    'Here is what I found regarding "{}": several records disagree.',
    'Let me search for "{}" in the registry.',
    'The entry for "{}" was updated last month.',
]

_ROLES = ["user", "assistant", "tool", "assistant"]


def variant_dimension(spark: SparkSession) -> DataFrame:
    """Small broadcastable dim: (group_id, variant_idx, name, n_variants,
    place, is_hamlet)."""
    rows = [
        (g, v, name, len(group), PLACE_CONTEXT.get(name), name in HAMLET_NAMES)
        for g, group in enumerate(VARIANT_GROUPS)
        for v, name in enumerate(group)
    ]
    return spark.createDataFrame(
        rows,
        "group_id int, variant_idx int, name string, n_variants int,"
        " place string, is_hamlet boolean",
    )


def synth_transcripts(
    spark: SparkSession,
    n_conversations: int = 300,
    turns_per_conv: int = 6,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Generate (transcripts, truth).

    ``truth(conv_id, group_id)`` is the ground-truth cluster assignment.
    Deterministic for a given (n_conversations, turns_per_conv, seed):
    conversation *i* is about group ``i % n_groups`` via variant
    ``xxhash(i, seed) % n_variants`` — every variant of every group appears
    once n_conversations covers the groups a few times over.
    """
    n_groups = len(VARIANT_GROUPS)
    dim = variant_dimension(spark)

    convs = (
        spark.range(n_conversations)
        .select(
            F.col("id").alias("conv_n"),
            F.format_string("conv-%06d", F.col("id")).alias("conv_id"),
            (F.col("id") % n_groups).cast("int").alias("group_id"),
        )
        .join(F.broadcast(dim.select("group_id", "n_variants").distinct()), "group_id")
        .withColumn(
            "variant_idx",
            F.pmod(F.xxhash64(F.col("conv_n"), F.lit(seed)), F.col("n_variants")).cast("int"),
        )
        .join(F.broadcast(dim), ["group_id", "variant_idx", "n_variants"])
    )

    truth = convs.select("conv_id", "group_id")

    template_col = F.array(*[F.lit(t) for t in _TEMPLATES])
    role_col = F.array(*[F.lit(r) for r in _ROLES])

    turns = convs.join(
        spark.range(turns_per_conv).select(F.col("id").cast("int").alias("turn_idx")),
        how="cross",
    )
    base_text = F.replace(
        F.element_at(
            template_col,
            (F.pmod(F.xxhash64("conv_n", "turn_idx", F.lit(seed)), F.lit(len(_TEMPLATES))) + 1).cast("int"),
        ),
        F.lit("{}"),
        F.col("name"),
    )
    # tool turns carry the conversation's side-channel context: the place
    # context as «place» (J5 within-names analog) and the entity kind as
    # "kind: hamlet" (is_hamlet analog).  With turns_per_conv < 3 there is
    # no tool turn, so the markers ride turn 0 instead — the extraction
    # scans every turn's text, and silently dropping them would make the
    # generator's own ground truth unsatisfiable (hamlet singletons would
    # merge, the place-context group would never cluster).
    if turns_per_conv >= len(_ROLES) - 1:
        is_tool_turn = F.pmod(F.col("turn_idx"), F.lit(len(_ROLES))) == 2
    else:
        is_tool_turn = F.col("turn_idx") == 0
    context_suffix = F.concat(
        F.when(
            is_tool_turn & F.col("place").isNotNull(),
            F.concat(F.lit(" near «"), F.col("place"), F.lit("»")),
        ).otherwise(F.lit("")),
        F.when(is_tool_turn & F.col("is_hamlet"), F.lit(" kind: hamlet")).otherwise(
            F.lit("")
        ),
    )
    transcripts = turns.select(
        "conv_id",
        "turn_idx",
        F.element_at(role_col, F.pmod(F.col("turn_idx"), F.lit(len(_ROLES))) + 1).alias("role"),
        F.concat(base_text, context_suffix).alias("text"),
        F.when(
            F.pmod(F.col("turn_idx"), F.lit(len(_ROLES))) == 2, F.lit("registry_search")
        ).alias("tool"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.col("conv_n") * 3600 + F.col("turn_idx") * 60
        ).alias("ts"),
    )
    return transcripts, truth

"""Blocking + salted candidate-pair generation (SURVEY.md §2.5 J1/J2).

The reference generates candidates with a per-item spatial SQL query
(`/root/reference/matcher/matcher.py:281-308`, LIMIT 50, gist index).  At
10^12-turn scale that becomes: explode normalised name tokens into an
inverted ``blocks`` index on each side, then equi-join on ``block_key``.

Token frequencies are Zipfian, so the join is skew-prone.  Defences,
in order:

1. **block-size cap** — blocks larger than ``max_block_size`` on either side
   are dropped (with audit counts); a token shared by 10^6 records carries no
   discriminative signal, exactly like the reference's skip_tags
   (place.py:70-85).
2. **salted join** — the probe side is salted into ``salt`` sub-keys and the
   build side exploded ``salt``-fold, bounding any single reducer's share of
   a hot key (north_rule requirement).
3. **AQE skew-join** stays on as the runtime backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_blocks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_block_size: int | None = None,
) -> DataFrame:
    """Explode a token-array column into an inverted (block_key, id) index.

    With ``max_block_size``, hot keys are removed *before* the join — a
    count-based semi-anti filter that runs as one cheap pre-aggregation.
    """
    blocks = df.select(
        F.col(id_col).alias("block_id"),
        F.explode(F.col(tokens_col)).alias("block_key"),
    ).dropDuplicates(["block_id", "block_key"])
    if max_block_size is not None:
        sizes = blocks.groupBy("block_key").agg(F.count("*").alias("block_n"))
        keep = sizes.filter(F.col("block_n") <= max_block_size).select("block_key")
        blocks = blocks.join(F.broadcast(keep), "block_key")
    return blocks


def block_size_stats(blocks: DataFrame) -> DataFrame:
    """Per-key block cardinality — the skew telemetry for the audit table."""
    return blocks.groupBy("block_key").agg(F.count("*").alias("block_n"))


def salted_pair_join(
    left_blocks: DataFrame,
    right_blocks: DataFrame,
    salt: int = 8,
) -> DataFrame:
    """Join two (block_key, block_id) indexes into candidate pairs.

    The left side gets a deterministic per-row salt (hash of its id), the
    right side is exploded across all salt values; joining on
    ``(block_key, salt)`` splits each hot key across ``salt`` reducers.
    Dedups (left_id, right_id) pairs that co-occur in several blocks, keeping
    the lexicographically-smallest key for lineage.
    """
    salted_left = left_blocks.select(
        F.col("block_id").alias("left_id"),
        "block_key",
        F.pmod(F.xxhash64("block_id"), F.lit(salt)).alias("salt"),
    )
    salted_right = right_blocks.select(
        F.col("block_id").alias("right_id"),
        "block_key",
        F.explode(F.array([F.lit(i) for i in range(salt)])).alias("salt"),
    )
    pairs = salted_left.join(salted_right, ["block_key", "salt"]).drop("salt")
    return pairs.groupBy("left_id", "right_id").agg(
        F.min("block_key").alias("block_key")
    )


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-group top-k (K1; the reference's ORDER BY dist LIMIT 50,
    matcher.py:306) as a rank window.  ``tiebreak`` columns make the cut
    deterministic when ``order_col`` has duplicates."""
    from pyspark.sql.window import Window

    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )

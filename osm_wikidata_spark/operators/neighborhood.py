"""Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95).

The classic merge/purge candidate generator: sort all records by a
blocking key, slide a window of ``w`` records over the sorted order, and
emit every pair that co-occurs in a window — i.e. every pair whose global
sort ranks differ by less than ``w``.  Complements the token/phonetic
channels in blocking.py: token blocking misses pairs that share no whole
token ("Smithfield"/"Smithfeld"), while a sorted neighborhood over the
key catches anything whose *prefix* sorts nearby, at a guaranteed
``N·(w-1)`` candidate budget — no hot-key blowup possible by
construction (the skew defence the salted join needs is unnecessary
here; the price is recall, which multi-pass SNM over several keys buys
back — run this once per key and union).

Scale shape (the whole point of this module):

* The textbook formulation needs a GLOBAL sort rank.  The naive Spark
  spelling — ``row_number() OVER (ORDER BY key)`` with no partition —
  collapses the entire table into ONE task and is exactly the
  single-partition bottleneck this repo bans at 10^12 rows.  Instead
  :func:`global_rank` computes the same rank distributedly:
  ``repartitionByRange`` (non-overlapping, ordered key ranges; Spark
  samples bounds) → ``row_number`` WITHIN each range partition (windows
  partitioned by ``spark_partition_id`` — parallel) → add each
  partition's exclusive cumulative row count, a #partitions-row dim
  (broadcast join).  The result is a pure function of the data and the
  total order — independent of the sampled bounds, partition count, and
  cluster size — so it is exactly reproducible in the SQL oracle.
* Pair generation then never touches the text again: explode offsets
  ``1..w-1`` on one side and equi-join on the dense integer rank — a
  perfectly balanced join with zero skew.

Determinism requires a TOTAL order: ``order_cols`` must end in a unique
tie-breaker (callers pass the id column last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    n_buckets: int | None = None,
) -> DataFrame:
    """Append a 0-based dense global sort rank over ``order_cols``.

    Distributed two-level ranking — see the module docstring.  The
    ``order_cols`` tuple must be a total order (unique per row) or ranks
    within a tie group are partition-dependent.  ``n_buckets`` defaults
    to ``spark.sql.shuffle.partitions``.
    """
    cols = [F.col(c) for c in order_cols]
    parted = (
        df.repartitionByRange(n_buckets, *cols)
        if n_buckets is not None
        else df.repartitionByRange(*cols)
    )
    # the localCheckpoint is LOAD-BEARING for correctness, not an
    # optimisation (same hazard as operators/packing.py, where the
    # double exchange was observed in the executed plan): the ranked
    # branch and the counts branch below both consume this frame, and
    # without the materialisation each plans its OWN range exchange
    # whose RangePartitioner re-samples bounds with an RDD-id-derived
    # seed — a row's _snm_part could then differ between the branches,
    # silently corrupting ranks once sampling is partial (at toy scale
    # the sample covers every row, which is why this never failed a
    # test).  Checkpointing pins one physical partitioning for both.
    # LAZY (r06): the RDD and its RangePartitioner are created (and the
    # bounds sampled once) at this call; eager=False only moves the
    # materialisation into the first consuming action, saving one whole
    # driver round-trip per rank — recomputation of a partition is
    # value-identical because the window below orders by the sort
    # columns, so ranks never depend on arrival order.
    parted = parted.withColumn(
        "_snm_part", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("_snm_part").orderBy(*cols)
    ranked = parted.withColumn("_snm_rn", F.row_number().over(w))
    # exclusive running count per range partition: #partitions rows, so
    # the single-partition window over the DIM is O(buckets), not O(N)
    # (counted off the pre-window frame — the window itself has exactly
    # one consumer and is computed once)
    counts = parted.groupBy("_snm_part").agg(F.count("*").alias("_snm_n"))
    woff = (
        Window.orderBy("_snm_part")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_snm_part",
        F.coalesce(F.sum("_snm_n").over(woff), F.lit(0).cast("long")).alias(
            "_snm_off"
        ),
    )
    return (
        ranked.join(F.broadcast(offsets), "_snm_part")
        .withColumn(
            rank_col, (F.col("_snm_off") + F.col("_snm_rn") - 1).cast("long")
        )
        .drop("_snm_part", "_snm_rn", "_snm_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 4,
    n_buckets: int | None = None,
) -> DataFrame:
    """Candidate pairs whose global (key, id) sort ranks differ by < ``window``.

    Returns ``(left_id, right_id, rank_gap)`` with ``left_id`` the
    rank-smaller record — exactly the pairs a width-``window`` slide over
    the sorted order produces, ``N·(window-1)`` rows in total.  Null keys
    sort first (Spark and standard SQL NULLS FIRST agree for ASC).

    One range-partition sort + one join on a dense integer; the offset
    explode is on the (rank, id) projection only, so no payload column
    rides the candidate shuffle.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    ranked = global_rank(
        df.select(F.col(id_col).alias("_snm_id"), F.col(key_col).alias("_snm_key")),
        ["_snm_key", "_snm_id"],
        n_buckets=n_buckets,
    ).select("_snm_id", "rank")
    left = ranked.select(
        F.col("_snm_id").alias("left_id"),
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + window - 1)
        ).alias("_snm_other"),
        F.col("rank").alias("_snm_lrank"),
    )
    right = ranked.select(
        F.col("_snm_id").alias("right_id"), F.col("rank").alias("_snm_other")
    )
    return left.join(right, "_snm_other").select(
        "left_id",
        "right_id",
        (F.col("_snm_other") - F.col("_snm_lrank")).cast("int").alias("rank_gap"),
    )


def multi_pass_snm(
    df: DataFrame,
    id_col: str,
    key_cols: list[str],
    window: int = 4,
    n_buckets: int | None = None,
) -> DataFrame:
    """Multi-pass sorted neighborhood — the form Hernández & Stolfo
    actually recommend: several cheap passes with DIFFERENT sort keys and
    a small window beat one pass with a large window, because a single
    key's sort order hides pairs that differ in its leading characters
    (prefix typos).  Classic second key: the reversed string.

    Returns orientation-normalised distinct pairs ``(left_id, right_id,
    n_passes, min_gap)`` with ``left_id < right_id``: how many passes
    proposed the pair and the smallest rank gap any pass saw (a cheap
    closeness prior for downstream scheduling — pairs found by several
    passes, or adjacent in some order, are likelier matches and can be
    scored first, the pay-as-you-go ordering).

    Cost is exactly ``len(key_cols)`` independent single-pass budgets
    (each N·(window−1) candidates) + one pair groupBy; passes share no
    state, so a scheduler can run them concurrently.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    passes = None
    for key in key_cols:
        p = sorted_neighborhood_pairs(
            df, id_col, key, window=window, n_buckets=n_buckets
        )
        passes = p if passes is None else passes.unionByName(p)
    a, b = F.col("left_id"), F.col("right_id")
    return (
        passes.select(
            F.least(a, b).alias("left_id"),
            F.greatest(a, b).alias("right_id"),
            "rank_gap",
        )
        .groupBy("left_id", "right_id")
        .agg(
            F.count("*").alias("n_passes"),
            F.min("rank_gap").alias("min_gap"),
        )
    )

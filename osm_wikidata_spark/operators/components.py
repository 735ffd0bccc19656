"""Transitive clustering: connected components over the match-edge DataFrame
(SURVEY.md §2.5 J8; required by BASELINE.json north_rule).

Implements the alternating large-star / small-star algorithm of Kiveris et
al., "Connected Components in MapReduce and Beyond" (SOCC'14) as pure
DataFrame min-over-partition-window rounds:

* **large-star**: for every node u, connect each strictly-larger neighbour
  to min(Γ(u) ∪ {u}).
* **small-star**: for every node u, connect u and each neighbour ≤ u to the
  minimum of that set.

Each star pass is ONE shuffle: the per-node minimum is a window aggregate
over the neighbour rows already co-located by u (a groupBy + join-back
would shuffle the neighbour table a second time — see _large_star);
convergence is when the edge set is a fixpoint (a forest of depth-1 stars
whose centres are the component minima).  Rounds are ``localCheckpoint``-ed
so lineage stays bounded — the 10^12-scale variant swaps that for a
checkpoint-table write per round (plans/checkpoint.py) which also makes the
loop resumable.

There is no reference implementation to cite — the reference enforces 1:1
matches instead (`/root/reference/matcher/matcher.py:1429-1481`); transitive
clustering is graft-new per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """(u, v) with u < v, self-loops dropped, deduplicated."""
    return (
        edges.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _bidirectional(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """Replace every edge (u, v>u) by (v, min(Γ(u) ∪ {u})).

    The per-node minimum rides a partition WINDOW over u rather than a
    groupBy + join-back: both need every neighbour row co-located by u,
    but the window does it in ONE exchange where the join re-shuffles the
    full neighbour table a second time to meet its own aggregate — at
    10^12 edges that halves the shuffled bytes of every CC round (the
    star passes dominate the job).  Skew: a hot node's neighbours landed
    in one partition under either plan, but the window BUFFERS them in
    one (spillable) task where the sort-merge join streamed them and was
    AQE-skew-splittable — the window trade is right HERE because every
    pair generator in this engine caps block/bucket/cell sizes upstream
    (max_block_size / max_bucket / max_cell), bounding the degree a node
    can enter CC with, and large-star itself is the pass that breaks hot
    stars up.  An uncapped external edge feed should cap degrees first
    (contrast cap_buckets, which KEEPS groupBy+join for exactly this
    reason: its whole job is to meet uncapped skew).

    The output is NOT re-canonicalised here: it contains no self-loops
    (min_n ≤ u < v strictly) and is orientation-free for the next pass
    (:func:`_small_star` symmetrises its input), while duplicates are
    min-neutral inside small-star's window and collapse in small-star's
    own ``_canonical``.  Dropping the mid-round dedup removes one full
    exchange of the edge set from EVERY round (measured plan: 4 → 3
    exchanges per round; the per-round output is byte-identical because
    small-star's canonical dedup still runs)."""
    from pyspark.sql.window import Window

    nb = _bidirectional(e)
    min_n = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        nb.withColumn("min_n", min_n)
        .filter(F.col("v") > F.col("u"))
        # orient (v, min_n): min_n < v strictly, so rows are canonical
        # (small, large) swapped — small_star's _bidirectional handles it
        .select(F.col("v").alias("u"), F.col("min_n").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For every node, hang itself and its ≤ neighbours off their minimum.

    Same one-exchange window shape as :func:`_large_star`; the centre
    rows (u, min) are emitted once per neighbour instead of once per node
    — :func:`_canonical`'s dropDuplicates (already required by the
    algorithm) collapses them, so no extra shuffle is introduced."""
    from pyspark.sql.window import Window

    nb = _bidirectional(e).filter(F.col("v") <= F.col("u"))
    nb = nb.withColumn("min_n", F.min("v").over(Window.partitionBy("u")))
    rehung = nb.select(F.col("v").alias("u"), F.col("min_n").alias("v"))
    centres = nb.select(F.col("u"), F.col("min_n").alias("v"))
    return _canonical(rehung.union(centres))


def connected_components(
    edges: DataFrame,
    src: str = "left_id",
    dst: str = "right_id",
    max_iterations: int = 30,
    checkpoint: bool = True,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    Returns ``(node, component)``.  O(log^2 n) rounds; on the chain/star
    graphs of the tests, <10.

    HAZARD — ``checkpoint=False`` disables the per-round lineage cut
    entirely and is safe ONLY for graphs that converge in ~1 round
    (already-canonical star forests, e.g. re-verifying a stored
    assignment): every star pass references its input 2-4×, so the uncut
    plan tree grows exponentially per round and analysis/AQE-re-optimise
    walk the whole tree — MEASURED as a planning livelock on a 50-edge /
    6-round toy graph.  It is NOT a dynamic-allocation escape hatch from
    ``localCheckpoint``'s executor-pinned blocks; on clusters with
    executor churn use the checkpoint-TABLE loop (one stage-table write
    per round via plans/checkpoint.py, which is also what makes the
    10^12-edge run resumable) instead.  PySpark offers no third cut:
    ``persist`` dedups execution but not the logical tree the planner
    walks, and an RDD round-trip pickles every row through Python.
    """
    def _sig_agg(df: DataFrame) -> DataFrame:
        """Order-independent set signature as a 1-row aggregate frame
        (count + sum of row hashes) instead of an exceptAll join."""
        return df.agg(
            F.count("*").alias("n"),
            # decimal sum: xxhash64 values overflow bigint under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        )

    def _signature(df: DataFrame) -> tuple:
        row = _sig_agg(df).first()
        return (row["n"], row["h"])

    # LAZY localCheckpoint + eager signature: the signature aggregate is
    # the action that materialises (and thereby checkpoints) each round's
    # edge set, so every round costs ONE job instead of two (the eager
    # checkpoint job + a separate signature job) — at a fixed ~0.1-0.3 s
    # of scheduling latency per job, that halves the per-round overhead
    # that dominates CC on small/converged graphs while changing nothing
    # at scale (the same partitions are computed once either way).
    e = _canonical(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    sig = None

    for _ in range(max_iterations):
        stepped = _small_star(_large_star(e))
        if checkpoint:
            stepped = stepped.localCheckpoint(eager=False)
        if sig is None:
            # round 1 folds the INPUT signature into its own job (a union
            # of the two 1-row aggregates): the input checkpoint is a
            # shared dependency computed once, so the former standalone
            # input-signature action — pure per-action scheduling latency
            # at any scale — disappears.  Signature values are unchanged.
            rows = (
                _sig_agg(e).withColumn("_w", F.lit(0))
                .unionByName(_sig_agg(stepped).withColumn("_w", F.lit(1)))
                .collect()
            )
            by = {r["_w"]: (r["n"], r["h"]) for r in rows}
            sig, new_sig = by[0], by[1]
        else:
            new_sig = _signature(stepped)
        e = stepped
        if new_sig == sig:
            break
        sig = new_sig

    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    # at the fixpoint edges are (root, child) with root < child
    labels = (
        e.select(F.col("v").alias("node"), F.col("u").alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def incremental_components(
    assignments: DataFrame,
    new_edges: DataFrame,
    src: str = "left_id",
    dst: str = "right_id",
    max_iterations: int = 30,
    checkpoint: bool = True,
) -> DataFrame:
    """Fold a batch of new match edges into an existing ``(node,
    component)`` assignment WITHOUT re-clustering the full graph.

    The streaming counterpart of :func:`connected_components` (pairs with
    ``streaming/incremental.py``'s per-batch edge scoring): contract every
    new edge to the current component labels of its endpoints, run CC on
    the contracted graph — whose size is O(batch), independent of the
    accumulated graph — then recompose:

    * existing components whose label got merged are re-labelled by one
      join on the component key (the only full-table touch, and the meta
      mapping is batch-sized, so AQE broadcasts it);
    * brand-new nodes take their contracted label directly.

    Labels stay the component-minimum node id: an old label is already the
    min of its members, so the contracted min over {old labels, new nodes}
    is the min over the merged membership — identical to what a full
    recompute would produce.  That makes incremental-vs-batch equality
    testable exactly (tests/test_components.py) and the state resumable
    from any committed assignment generation.
    """
    a = assignments.select("node", "component")
    e = (
        new_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    # endpoints -> current labels (nodes unseen so far label themselves)
    cu = a.select(F.col("node").alias("u"), F.col("component").alias("cu"))
    cv = a.select(F.col("node").alias("v"), F.col("component").alias("cv"))
    contracted = (
        e.join(cu, "u", "left")
        .join(cv, "v", "left")
        .select(
            F.coalesce("cu", "u").alias("left_id"),
            F.coalesce("cv", "v").alias("right_id"),
        )
    )
    meta = connected_components(
        contracted, max_iterations=max_iterations, checkpoint=checkpoint
    )

    # re-label merged components: one join keyed on the (batch-sized) meta
    relabel = meta.select(
        F.col("node").alias("component"), F.col("component").alias("merged")
    )
    updated = a.join(relabel, "component", "left").select(
        "node", F.coalesce("merged", "component").alias("component")
    )
    # nodes first seen in this batch: in meta (as themselves) but not in a
    fresh = (
        meta.join(a.select(F.col("node")), "node", "left_anti")
        .select("node", "component")
    )
    return updated.unionByName(fresh)


def components_at_thresholds(
    edges: DataFrame,
    thresholds: list[float],
    weight_col: str = "weight",
    src: str = "left_id",
    dst: str = "right_id",
    max_iterations: int = 30,
) -> DataFrame:
    """Cluster assignments at several score thresholds in one frame:
    ``(threshold, node, component)`` — the Splink-style hierarchy view
    that lets an analyst pick the linkage operating point by inspecting
    how clusters merge as the threshold drops.

    Node universe is FIXED across thresholds (every endpoint of the input
    edge set), so rows per threshold are comparable: a node whose edges
    all fall below a threshold appears as its own singleton component.

    Scale shape: one CC run per threshold over the filtered edge set —
    thresholds are few (an analyst's ladder, not a sweep), CC rounds
    dominate, and the runs are independent (a scheduler can execute them
    concurrently).  Monotonicity (clusters only merge as the threshold
    drops) is a model property, pinned by tests rather than exploited for
    incremental reuse — at 10^12 edges the simple per-threshold run
    re-reads the edge set, which is cheaper than materialising the
    merge-tree state between levels.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    out = None
    for t in thresholds:
        cc = connected_components(
            edges.filter(F.col(weight_col) >= t).select(src, dst),
            src,
            dst,
            max_iterations=max_iterations,
        )
        full = (
            nodes.join(cc, "node", "left")
            .select(
                F.lit(float(t)).alias("threshold"),
                "node",
                F.coalesce("component", "node").alias("component"),
            )
        )
        out = full if out is None else out.unionByName(full)
    return out

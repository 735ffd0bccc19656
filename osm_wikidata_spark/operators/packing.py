"""Sequence packing for LLM pretraining pipelines.

The standard GPT-style packing is concat-and-chunk: concatenate every
document's tokens in a fixed order into one logical stream, then cut the
stream into fixed-``budget`` training sequences.  This operator computes
each document's placement in that stream — which sequence it starts in
and at what offset — as pure DataFrame algebra, so the downstream
tokenise-and-emit step (which needs the actual token ids) can run
embarrassingly parallel with no further coordination: every worker knows
exactly where its documents land.

Semantics are an exclusive running sum: ``start_offset`` is the total
token count of all earlier documents in the group's order,
``seq_id = start_offset // budget``, ``seq_offset = start_offset %
budget``.  A document whose tokens cross a boundary simply spans into the
following sequence(s) — exactly the concat-and-chunk behaviour (no
padding, no doc-boundary alignment).  Deterministic: a pure function of
(group, order, token counts), independent of partitioning or cluster
size, hence exactly reproducible in the SQL oracle.

Scale shape.  With a ``group_col``, one window aggregation per group
partition — k independent streams in parallel.  With ``group_col=None``
(one GLOBAL stream) the naive plan is a single unpartitioned running-sum
window that funnels the whole input through one task; instead the global
path runs the classic TWO-PASS distributed prefix sum (Blelloch scan
shape): range-partition on the order key so partitions hold contiguous
stream segments, compute each partition's exclusive running sum locally
(n-way parallel window on the partition id), then add each partition's
exclusive prefix offset — a ≤-num-partitions-row frame, windowed
trivially and broadcast back.  Values are identical to the single-window
plan (pinned by test) and independent of the partition count: the
exclusive cumulative sum over a total order decomposes exactly across
any contiguous segmentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_col: str | None = None,
    order_col: str | None = None,
    single_stream_ok: bool = False,
) -> DataFrame:
    """Assign every document its concat-and-chunk placement.

    Returns one row per document: ``(doc_id[, group], n_tokens,
    start_offset, seq_id, seq_offset)``.  ``order_col`` defaults to
    ``id_col``; ordering ties are broken by ``id_col`` so the stream is
    total-ordered and the result deterministic.  Zero-token documents
    occupy no stream space (their start equals the next doc's).

    ``group_col=None`` packs ONE global stream via the distributed
    two-pass prefix sum described in the module docstring — no single
    funnel task, safe at corpus scale.  ``single_stream_ok`` is retained
    for API compatibility from when the global path was a single
    unpartitioned window and warned; it is now a no-op.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = order_col or id_col

    if group_col is not None:
        w = (
            Window.partitionBy(group_col)
            .orderBy(F.col(order), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        start = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col),
            F.col(token_col).alias("n_tokens"),
            start.alias("start_offset"),
            F.floor(start / budget).cast("long").alias("seq_id"),
            (start % budget).cast("long").alias("seq_offset"),
        )

    # global stream: two-pass distributed prefix sum.
    try:
        n_parts = int(
            docs.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):  # e.g. "auto" under some vendors
        n_parts = 200
    # contiguous stream segments in partition-id order (RangePartitioner
    # assigns ascending key ranges to ascending partition ids; an
    # explicit partition count is a REPARTITION_BY_NUM shuffle, which AQE
    # never coalesces).  The eager localCheckpoint is LOAD-BEARING for
    # correctness, not an optimisation: pass 1 and pass 2 both consume
    # this frame, and without the materialisation each branch plans its
    # OWN range exchange (observed in the executed plan — two
    # rangepartitioning nodes, no ReusedExchange) whose RangePartitioner
    # re-samples boundaries with an RDD-id-derived seed, so a row's
    # _pack_pid could differ between the branches and corrupt offsets
    # silently on skewed data.  Checkpointing pins one physical
    # partitioning that both branches read; the frame is a narrow
    # (order, id, tokens, pid) projection, so the materialisation is the
    # cheap side of the trade at any scale.
    needed = list(dict.fromkeys([order, id_col, token_col]))
    ranged = (
        docs.select(*needed)
        .repartitionByRange(n_parts, F.col(order), F.col(id_col))
        .withColumn("_pack_pid", F.spark_partition_id())
        # LAZY (r06): bounds are sampled once when this RDD is created
        # here; eager=False just folds the materialisation into the first
        # consuming action (one fewer driver round-trip) — per-partition
        # recomputation is value-identical because both windows order by
        # (order, id), never by arrival order
        .localCheckpoint(eager=False)
    )
    # pass 1: exclusive running sum WITHIN each segment — n-way parallel
    w_in = (
        Window.partitionBy("_pack_pid")
        .orderBy(F.col(order), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local_start",
        F.coalesce(F.sum(token_col).over(w_in), F.lit(0).cast("long")),
    )
    # pass 2: each segment's exclusive prefix offset — a ≤ n_parts-row
    # frame; its unpartitioned window is trivially cheap at any scale
    totals = ranged.groupBy("_pack_pid").agg(
        F.sum(token_col).cast("long").alias("_part_total")
    )
    w_tot = Window.orderBy("_pack_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pack_pid",
        F.coalesce(F.sum("_part_total").over(w_tot), F.lit(0).cast("long")).alias(
            "_part_offset"
        ),
    )
    joined = local.join(F.broadcast(offsets), "_pack_pid")
    start = F.col("_local_start") + F.col("_part_offset")
    return joined.select(
        F.col(id_col).alias("doc_id"),
        F.col(token_col).alias("n_tokens"),
        start.cast("long").alias("start_offset"),
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("seq_offset"),
    )

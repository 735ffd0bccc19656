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

Scale shape: one window aggregation per ``group_col`` partition.  The
running sum is inherently sequential WITHIN a group, so the group column
is the parallelism knob: ``None`` packs one global stream (a single
window partition — fine up to ~10^8 rows on one beefy executor, a
documented bottleneck beyond), while any bounded-cardinality column
(source, shard id, ``pmod(hash(id), k)``) packs k independent streams in
parallel, which is what real pipelines do (per-shard packing; sequence
ids are disjoint across shards by construction when composed with the
group key).
"""

from __future__ import annotations

import warnings

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

    ``group_col=None`` packs ONE global stream — a single unpartitioned
    running-sum window that funnels the whole input through one task (the
    documented bottleneck above; fine for exploration, wrong at corpus
    scale).  It warns unless ``single_stream_ok=True``; pass a
    bounded-cardinality ``group_col`` (source, shard id,
    ``pmod(hash(id), k)``) to pack k independent streams in parallel.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if group_col is None and not single_stream_ok:
        warnings.warn(
            "pack_sequences(group_col=None) packs one GLOBAL stream through "
            "a single unpartitioned window — the whole input funnels into "
            "one task. Pass group_col (source / shard / pmod(hash(id), k)) "
            "to pack independent streams in parallel, or "
            "single_stream_ok=True to silence this.",
            stacklevel=2,
        )
    order = order_col or id_col
    part = Window.partitionBy(*( [group_col] if group_col else [] ))
    w = (
        part.orderBy(F.col(order), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
    cols = [F.col(id_col).alias("doc_id")]
    if group_col:
        cols.append(F.col(group_col))
    return docs.select(
        *cols,
        F.col(token_col).alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("seq_offset"),
    )

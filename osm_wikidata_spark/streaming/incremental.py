"""Incremental ingest of new transcript partitions (SURVEY.md §2.12).

The reference is batch-only; its "streaming" surface is a progress
side-channel (Postgres NOTIFY → websocket, job_queue.py:187-234).  The
engine's incremental obligation is instead: when new transcript files land,
re-block ONLY the new conversations and score them against the existing
block index — a foreachBatch join, not a full recompute.

Structured Streaming shape::

    readStream(transcripts) → foreachBatch(increment) → append edges

Each micro-batch:
1. builds entities/blocks for the batch's conversations,
2. joins batch blocks against the persisted block index (old ∪ new),
3. scores only the new candidate pairs,
4. commits new blocks + entities as a fresh state GENERATION.

State layout (object-store-safe — no directory renames)::

    <state_dir>/MANIFEST                tiny pointer file naming the live gen
    <state_dir>/gen-000001/blocks       immutable generation directories
    <state_dir>/gen-000001/entities
    <state_dir>/gen-000001/assignments  (node, component) transitive clusters,
                                        maintained by contracted-graph
                                        incremental CC — O(batch) per commit

A generation directory is written in full, then the manifest is atomically
replaced to point at it.  On a POSIX filesystem the replace is
``os.replace`` (atomic rename of a FILE); on an object store the
equivalent is a single-object PUT, which is atomic on S3/GCS — unlike the
directory-rename dance this replaces, which has no object-store analog.
Every crash point is safe: an unreferenced generation directory is
invisible garbage; the manifest always names a fully-written generation.

Checkpointing is Spark's own streaming checkpoint (exactly-once per batch
given deterministic transforms).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.blocking import build_blocks, salted_pair_join
from ..operators.components import incremental_components
from ..plans.pipeline import extract_entities, score_pairs

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_MANIFEST = "MANIFEST"
_GEN_RE = re.compile(r"^gen-(\d{6})$")


def current_generation(state_dir: str) -> str | None:
    """Name of the live generation (``gen-NNNNNN``) or None if no state."""
    manifest = os.path.join(state_dir, _MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest, "r", encoding="ascii") as fh:
        gen = fh.read().strip()
    return gen or None


def state_paths(state_dir: str) -> tuple[str, str] | None:
    """(blocks_path, entities_path) of the live generation, or None.

    Falls back to the pre-manifest flat layout (``<state_dir>/blocks`` +
    ``<state_dir>/entities``, written by the directory-rename
    implementation this replaced) so an upgrade does not silently rebuild
    from empty; the first post-upgrade commit writes a real generation and
    GCs the legacy dirs.
    """
    gen = current_generation(state_dir)
    if gen is None:
        legacy_blocks = os.path.join(state_dir, "blocks")
        legacy_entities = os.path.join(state_dir, "entities")
        if os.path.exists(os.path.join(legacy_blocks, "_SUCCESS")):
            return legacy_blocks, legacy_entities
        return None
    gen_dir = os.path.join(state_dir, gen)
    return os.path.join(gen_dir, "blocks"), os.path.join(gen_dir, "entities")


def assignments_path(state_dir: str) -> str | None:
    """Path of the live generation's ``(node, component)`` assignment
    table, or None if the live generation predates component maintenance
    (upgrade note: backfill once with ``connected_components`` over the
    accumulated edges_dir, or accept that clusters restart from the next
    batch)."""
    gen = current_generation(state_dir)
    if gen is None:
        return None
    path = os.path.join(state_dir, gen, "assignments")
    return path if os.path.exists(os.path.join(path, "_SUCCESS")) else None


def _next_generation(state_dir: str) -> str:
    """First generation name greater than every existing gen dir — so an
    orphaned directory from a crashed commit is never re-used."""
    highest = 0
    if os.path.isdir(state_dir):
        for name in os.listdir(state_dir):
            m = _GEN_RE.match(name)
            if m:
                highest = max(highest, int(m.group(1)))
    return f"gen-{highest + 1:06d}"


def _commit_generation(state_dir: str, gen: str, keep: int = 2) -> None:
    """Atomically repoint the manifest at ``gen``, then GC old generations.

    The write is tmp-file + ``os.replace`` (atomic on POSIX); an
    object-store port does a single PUT of the manifest object instead.
    The last ``keep`` generations are retained so lazy plans referencing
    the previous generation's files keep working across one commit.
    """
    manifest = os.path.join(state_dir, _MANIFEST)
    tmp = manifest + ".tmp"
    with open(tmp, "w", encoding="ascii") as fh:
        fh.write(gen + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, manifest)
    current = int(_GEN_RE.match(gen).group(1))
    for name in os.listdir(state_dir):
        m = _GEN_RE.match(name)
        if m and int(m.group(1)) <= current - keep:
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    # pre-manifest flat layout, adopted read-only by state_paths(): once a
    # real generation is committed its contents are folded in — GC it
    for legacy in ("blocks", "entities"):
        path = os.path.join(state_dir, legacy)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)


def _merge_entity_rows(entities: DataFrame) -> DataFrame:
    """Set-union merge of per-conversation entity rows.

    A conversation whose turns span micro-batches has one PARTIAL entity
    row per batch; keeping an arbitrary one (the old
    ``dropDuplicates(["conv_id"])``) silently lost mentions, making
    match decisions depend on union order.  The merge is EXACT because
    every entity column is derived per NAME (token/full-name/acronym
    keys, ending rules) or is itself a set/flag — the union of the
    partial rows' arrays equals a fresh ``extract_entities`` over the
    full conversation, and the decision context treats endings /
    place_names as order-insensitive sets (``score_pairs`` sorts them
    into the ctx fingerprint).  Idempotent, so a retried identical
    micro-batch still collapses to the same row.
    """
    return entities.groupBy("conv_id").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("names")))).alias(
            "names"
        ),
        F.array_distinct(F.flatten(F.collect_list("tokens"))).alias("tokens"),
        F.array_distinct(F.flatten(F.collect_list("endings"))).alias("endings"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("place_names")))
        ).alias("place_names"),
        F.max("is_hamlet").alias("is_hamlet"),
    )


def incremental_edges_batch(
    spark: SparkSession,
    batch_transcripts: DataFrame,
    state_dir: str,
    max_block_size: int | None = 1000,
    salt: int = 8,
) -> DataFrame:
    """Process one micro-batch: return new edges, commit a new state gen."""
    new_entities = extract_entities(batch_transcripts)
    # state keeps the UNCAPPED index: a key hot within one batch must still
    # contribute its full membership to the global counts, or the global
    # re-cap below would undercount it and re-admit a mega-block with
    # missing members.  Capping happens ONLY at the global level.
    new_blocks = build_blocks(new_entities, "conv_id", "tokens", max_block_size=None)

    live = state_paths(state_dir)
    if live is not None:
        blocks_path, entities_path = live
        old_blocks = spark.read.parquet(blocks_path)
        old_entities = spark.read.parquet(entities_path)
        # dedupe blocks on identity: a retried micro-batch re-unions its
        # rows, and duplicate block rows would double-count pairs downstream
        all_blocks = old_blocks.unionByName(new_blocks).dropDuplicates(
            ["block_id", "block_key"]
        )
        # entities MERGE per conversation (same one-shuffle cost as the
        # dropDuplicates this replaces) — see _merge_entity_rows
        all_entities = _merge_entity_rows(
            old_entities.unionByName(new_entities)
        )
    else:
        all_blocks = new_blocks
        all_entities = new_entities

    # probe with EVERY key of every conversation touched by this batch,
    # not just the batch's own partial keys: a conversation whose turns
    # span batches gained mentions, so pairs reachable through its OLD
    # keys must be (re)scored under the merged mention set.  Re-emitted
    # edges are additive downstream (incremental CC unions matched
    # edges), and the semi join is a broadcast of this batch's conv ids
    # — no extra shuffle.
    touched = F.broadcast(
        new_entities.select(F.col("conv_id").alias("block_id")).distinct()
    )
    probe_source = all_blocks.join(touched, "block_id", "left_semi")

    # hot-key cap against GLOBAL counts: a key under the cap within every
    # single batch can still accumulate into a mega-block across batches
    if max_block_size is not None:
        sizes = all_blocks.groupBy("block_key").agg(F.count("*").alias("n"))
        hot = F.broadcast(
            sizes.filter(F.col("n") > max_block_size).select("block_key")
        )
        probe_blocks = probe_source.join(hot, "block_key", "left_anti")
        build_blocks_side = all_blocks.join(hot, "block_key", "left_anti")
    else:
        probe_blocks, build_blocks_side = probe_source, all_blocks

    # candidate pairs touching at least one NEW conversation
    pairs = salted_pair_join(probe_blocks, build_blocks_side, salt=salt).filter(
        F.col("left_id") != F.col("right_id")
    )
    pairs = pairs.select(
        F.least("left_id", "right_id").alias("left_id"),
        F.greatest("left_id", "right_id").alias("right_id"),
        "block_key",
    ).dropDuplicates(["left_id", "right_id"])

    # materialise edges BEFORE the commit: generation GC (keep=2) protects
    # one commit's worth of lazy reads, but eager is simpler to reason about
    edges = score_pairs(pairs, all_entities).localCheckpoint(eager=True)

    gen = _next_generation(state_dir)
    gen_dir = os.path.join(state_dir, gen)
    all_blocks.write.mode("overwrite").parquet(os.path.join(gen_dir, "blocks"))
    all_entities.write.mode("overwrite").parquet(os.path.join(gen_dir, "entities"))
    # transitive clusters ride the same generation: contracted-graph
    # incremental CC over this batch's accepted edges — O(batch) work, no
    # full-graph recompute (operators/components.py incremental_components)
    prev_path = assignments_path(state_dir)
    prev = (
        spark.read.parquet(prev_path)
        if prev_path is not None
        else spark.createDataFrame([], "node string, component string")
    )
    incremental_components(prev, edges.filter(F.col("matched"))).write.mode(
        "overwrite"
    ).parquet(os.path.join(gen_dir, "assignments"))
    _commit_generation(state_dir, gen)
    return edges


def stream_transcripts(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    edges_dir: str,
):
    """Wire the incremental batch into a Structured Streaming query."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _for_each(batch_df: DataFrame, batch_id: int) -> None:
        edges = incremental_edges_batch(spark, batch_df, state_dir)
        edges.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            edges_dir
        )

    return (
        stream.writeStream.foreachBatch(_for_each)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

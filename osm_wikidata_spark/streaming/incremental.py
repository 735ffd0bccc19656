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
4. appends new blocks + edges to the persisted state tables.

Checkpointing is Spark's own streaming checkpoint (exactly-once per batch
given deterministic transforms).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.blocking import build_blocks, salted_pair_join
from ..plans.pipeline import extract_entities, score_pairs

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def incremental_edges_batch(
    spark: SparkSession,
    batch_transcripts: DataFrame,
    state_dir: str,
    max_block_size: int | None = 1000,
    salt: int = 8,
) -> DataFrame:
    """Process one micro-batch: return new edges, update persisted state.

    State layout: ``<state_dir>/blocks`` (block index so far) and
    ``<state_dir>/entities`` (names per conversation so far).
    """
    blocks_path = os.path.join(state_dir, "blocks")
    entities_path = os.path.join(state_dir, "entities")
    # a crash mid-_swap can leave the live state parked at <path>_old;
    # restore it before reading or we'd silently rebuild from empty
    _recover(blocks_path), _recover(entities_path)

    new_entities = extract_entities(batch_transcripts)
    new_blocks = build_blocks(new_entities, "conv_id", "tokens", max_block_size)

    have_state = os.path.exists(os.path.join(blocks_path, "_SUCCESS"))
    if have_state:
        old_blocks = spark.read.parquet(blocks_path)
        old_entities = spark.read.parquet(entities_path)
        # dedupe on identity: a retried micro-batch re-unions its rows, and
        # duplicate block/entity rows would double-count pairs downstream
        all_blocks = old_blocks.unionByName(new_blocks).dropDuplicates(
            ["block_id", "block_key"]
        )
        all_entities = old_entities.unionByName(new_entities).dropDuplicates(
            ["conv_id"]
        )
    else:
        all_blocks = new_blocks
        all_entities = new_entities

    # re-apply the hot-key cap against GLOBAL counts: a key under the cap
    # within every single batch can still accumulate into a mega-block
    # across batches (state keeps the uncapped index so counts stay true)
    if max_block_size is not None:
        sizes = all_blocks.groupBy("block_key").agg(F.count("*").alias("n"))
        hot = F.broadcast(
            sizes.filter(F.col("n") > max_block_size).select("block_key")
        )
        probe_blocks = new_blocks.join(hot, "block_key", "left_anti")
        build_blocks_side = all_blocks.join(hot, "block_key", "left_anti")
    else:
        probe_blocks, build_blocks_side = new_blocks, all_blocks

    # candidate pairs touching at least one NEW conversation
    pairs = salted_pair_join(probe_blocks, build_blocks_side, salt=salt).filter(
        F.col("left_id") != F.col("right_id")
    )
    pairs = pairs.select(
        F.least("left_id", "right_id").alias("left_id"),
        F.greatest("left_id", "right_id").alias("right_id"),
        "block_key",
    ).dropDuplicates(["left_id", "right_id"])

    # materialise edges BEFORE the state swap: the lazy plan references the
    # old state files, which the swap deletes
    edges = score_pairs(pairs, all_entities).localCheckpoint(eager=True)

    # persist updated state (idempotent per batch id when used in foreachBatch)
    all_blocks.write.mode("overwrite").parquet(blocks_path + "_next")
    all_entities.write.mode("overwrite").parquet(entities_path + "_next")
    _swap(blocks_path), _swap(entities_path)
    return edges


def _recover(path: str) -> None:
    """Undo an interrupted :func:`_swap`: if the live dir is missing but
    the parked ``_old`` generation exists, restore it.  Called before every
    state read AND at the top of _swap, so no crash point loses state."""
    old = path + "_old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)


def _swap(path: str) -> None:
    """Promote ``<path>_next`` to ``<path>`` crash-safely.

    Rename the live dir aside FIRST, then promote, then delete the old
    generation.  Every crash point leaves a recoverable state: before the
    park, the live dir is intact; between park and promote, the state lives
    at ``_old`` and :func:`_recover` restores it; after the promote, the
    new generation is live and ``_old`` is garbage collected on the next
    call.  Never an empty state that would silently drop all cross-batch
    candidate pairs.
    """
    import shutil

    _recover(path)
    old = path + "_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(path + "_next", path)
    if os.path.exists(old):
        shutil.rmtree(old)


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

"""Per-partition lineage + metrics audit (SURVEY.md §2.6 A8; north_rule).

Every pipeline stage appends one row per (stage, partition) with row counts,
and scored stages add score/block histograms.  The reference's analog is the
Timing table + NOTIFY progress events (model.py:1605-1611,
job_queue.py:187-234); here it is an append-only table so a 1000-executor
run leaves an auditable trail without driver round-trips.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def partition_metrics(df: DataFrame, run_id: str, stage_name: str) -> DataFrame:
    """One row per Spark partition: (run_id, stage, partition_id, rows)."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage_name).alias("stage"),
            "partition_id",
            "rows",
            F.current_timestamp().alias("ts"),
        )
    )


def block_skew_metrics(blocks: DataFrame, run_id: str) -> DataFrame:
    """Block-size distribution: the skew telemetry the north_rule asks for."""
    sizes = blocks.groupBy("block_key").agg(F.count("*").alias("block_n"))
    return sizes.agg(
        F.lit(run_id).alias("run_id"),
        F.lit("blocks").alias("stage"),
        F.count("*").alias("n_blocks"),
        F.max("block_n").alias("max_block"),
        F.avg("block_n").alias("avg_block"),
        F.expr("percentile_approx(block_n, 0.5)").alias("p50_block"),
        F.expr("percentile_approx(block_n, 0.99)").alias("p99_block"),
        F.current_timestamp().alias("ts"),
    )


def score_distribution(edges: DataFrame, run_id: str) -> DataFrame:
    """Decision-kind histogram over scored edges (A8 score_hist analog):
    how many pairs matched per cascade kind, plus the miss count."""
    return (
        edges.groupBy(F.coalesce("kind", F.lit("no_match")).alias("kind"))
        .agg(F.count("*").alias("pairs"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit("edges").alias("stage"),
            "kind",
            "pairs",
            F.current_timestamp().alias("ts"),
        )
    )


def append_audit(df: DataFrame, run_dir: str | None, table: str) -> None:
    """Append metric rows under <run_dir>/audit/<table> (no-op without run_dir)."""
    if run_dir is None:
        return
    df.write.mode("append").parquet(os.path.join(run_dir, "audit", table))

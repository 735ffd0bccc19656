"""Bucketed storage for co-located joins (SURVEY.md §4 partitioning).

At 10^12 turns the blocks/pairs tables are re-joined repeatedly (pair
generation, rehydration, incremental ingest).  Persisting them bucketed by
their join key makes every later equi-join on that key **shuffle-free**:
both sides are already hash-distributed identically, so Catalyst plans a
SortMergeJoin with no Exchange.  This module is the thin storage shim —
``write_bucketed`` + ``read_table`` — kept separate so the Iceberg
equivalent (``write.format("iceberg")`` with a bucket partition transform)
is a drop-in swap, mirroring plans/checkpoint.py's storage isolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a managed table bucketed (and optionally sorted)
    by the join key.  ``n_buckets`` should match the cluster's target
    parallelism for the downstream joins (64 here for the local harness;
    thousands at 100 TB)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two tables bucketed on the same key — plans with NO shuffle
    exchange when bucket counts match (verified by tests/test_bucketing.py)."""
    return read_table(spark, left_table).join(read_table(spark, right_table), on)

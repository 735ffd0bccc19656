"""Bucketed-join plan test: co-bucketed tables must join WITHOUT a shuffle
exchange — the co-location discipline that makes repeated block-key joins
affordable at 10^12 rows."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from osm_wikidata_spark.plans.bucketing import cobucketed_join, write_bucketed


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # disable broadcast so the plan must rely on co-bucketing (at 10^12 rows
    # neither side broadcasts); restored in the finally block
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.range(1000).select(
        (F.col("id") % 97).cast("string").alias("block_key"),
        F.col("id").alias("left_id"),
    )
    right = spark.range(1000).select(
        (F.col("id") % 97).cast("string").alias("block_key"),
        F.col("id").alias("right_id"),
    )
    write_bucketed(left, "t_blocks_left", "block_key", n_buckets=8)
    write_bucketed(right, "t_blocks_right", "block_key", n_buckets=8)
    try:
        joined = cobucketed_join(spark, "t_blocks_left", "t_blocks_right", ["block_key"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        # and the join still returns the right result
        assert joined.count() == sum(
            (1000 // 97 + (1 if k < 1000 % 97 else 0)) ** 2 for k in range(97)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS t_blocks_left")
        spark.sql("DROP TABLE IF EXISTS t_blocks_right")

"""Incremental ingest: new transcript files are blocked and scored against
the existing index only (streaming/incremental.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm_wikidata_spark.sources.transcripts import synth_transcripts
from osm_wikidata_spark.streaming.incremental import (
    incremental_edges_batch,
    stream_transcripts,
)


def test_incremental_batches_equal_full_run(spark, tmp_path):
    transcripts, _ = synth_transcripts(spark, n_conversations=60, turns_per_conv=3)
    state = os.path.join(str(tmp_path), "state")
    os.makedirs(state, exist_ok=True)

    batch1 = transcripts.filter(F.col("conv_id") < "conv-000030")
    batch2 = transcripts.filter(F.col("conv_id") >= "conv-000030")

    e1 = incremental_edges_batch(spark, batch1, state).filter("matched").collect()
    e2 = incremental_edges_batch(spark, batch2, state).filter("matched").collect()
    incremental = {
        tuple(sorted((r["left_id"], r["right_id"]))) for r in e1 + e2
    }

    from osm_wikidata_spark.plans.pipeline import run_pipeline

    full = run_pipeline(spark, transcripts)
    full_edges = {
        tuple(sorted((r["left_id"], r["right_id"])))
        for r in full["edges"].filter("matched").collect()
    }
    assert incremental == full_edges


def test_streaming_query_runs(spark, tmp_path):
    transcripts, _ = synth_transcripts(spark, n_conversations=30, turns_per_conv=3)
    src = os.path.join(str(tmp_path), "src")
    transcripts.write.parquet(src)

    state = os.path.join(str(tmp_path), "state")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    edges_dir = os.path.join(str(tmp_path), "edges")
    os.makedirs(state, exist_ok=True)

    q = stream_transcripts(spark, src, state, ckpt, edges_dir)
    q.awaitTermination(120)
    edges = spark.read.parquet(edges_dir)
    assert edges.count() > 0
    assert "batch_id" in edges.columns

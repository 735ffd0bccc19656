"""Stage-boundary checkpointing for resumable runs (SURVEY.md §7 stage 5).

The reference's resumability contract is a per-place state machine with a
commit per stage (`/root/reference/matcher/place.py:1289-1330`) plus
per-item done flags (place.py:1234).  The Spark equivalent: every pipeline
stage writes its output table once under ``<run_dir>/<stage>``; re-running
the pipeline with the same ``run_dir`` skips any stage whose ``_SUCCESS``
marker exists and reads the stored output instead.

Storage is parquet-with-manifest.  (Iceberg gives the same semantics via
snapshots, but the runtime jar is not available in this sandbox — the
storage layer is isolated here so swapping `.format("iceberg")` in is a
one-line change per SURVEY.md §7 risk register.)
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def stage(
    spark: SparkSession,
    run_dir: str | None,
    name: str,
    build: Callable[[], DataFrame],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Materialise one pipeline stage, or reuse a prior run's output.

    With ``run_dir=None`` checkpointing is off; the stage output is cached
    in memory instead so downstream stages don't recompute it (tests /
    small runs).
    """
    if run_dir is None:
        return build().cache()
    path = os.path.join(run_dir, name)
    if not _done(path):
        writer = build().write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    return spark.read.parquet(path)


def completed_stages(run_dir: str) -> list[str]:
    """Which stages a previous run finished (for resume diagnostics)."""
    if not os.path.isdir(run_dir):
        return []
    return sorted(
        d for d in os.listdir(run_dir) if _done(os.path.join(run_dir, d))
    )

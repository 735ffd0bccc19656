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

import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_PARAMS_MANIFEST.json"


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _params_hash(params: dict | None) -> str | None:
    if params is None:
        return None
    return hashlib.md5(
        json.dumps(params, sort_keys=True, default=str).encode()
    ).hexdigest()


def _manifest_matches(path: str, fingerprint: str | None) -> bool:
    """A stage output is reusable when its recorded parameter fingerprint
    matches (or no fingerprint is in play — legacy / un-parameterised)."""
    if fingerprint is None:
        return True
    manifest = os.path.join(path, _MANIFEST)
    if not os.path.exists(manifest):
        return False
    with open(manifest) as f:
        return json.load(f).get("params_hash") == fingerprint


def stage(
    spark: SparkSession,
    run_dir: str | None,
    name: str,
    build: Callable[[], DataFrame],
    partition_by: list[str] | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Materialise one pipeline stage, or reuse a prior run's output.

    With ``run_dir=None`` durable checkpointing is off; the stage output
    is localCheckpoint-ed (lazily) instead, so downstream stages neither
    recompute it NOR re-plan through it.  r06 evidence for checkpoint
    over ``.cache()``: a cached stage keeps its full child plan inside
    the InMemoryRelation, so every downstream query re-analyses the
    whole pipeline tree — the flagship's event log showed a 6.75 s
    driver-only gap (no job running) before the first real job, pure
    Catalyst time over the accumulated plan.  The LogicalRDD leaf a
    localCheckpoint leaves behind truncates that walk; like ``.cache()``
    the data is executor-pinned and non-fault-tolerant, which is exactly
    the tests/small-runs contract of the ``run_dir=None`` path (durable
    runs pass ``run_dir`` and get parquet stages).

    ``params`` fingerprints the stage's parameterisation: re-running the
    same ``run_dir`` with different parameters rebuilds the stage instead of
    silently reusing stale output (the ``_SUCCESS`` marker alone can't tell
    a max_block_size=50 run from a max_block_size=500 one).
    """
    if run_dir is None:
        return build().localCheckpoint(eager=False)
    path = os.path.join(run_dir, name)
    fingerprint = _params_hash(params)
    if not (_done(path) and _manifest_matches(path, fingerprint)):
        writer = build().write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        if fingerprint is not None:
            with open(os.path.join(path, _MANIFEST), "w") as f:
                json.dump({"params_hash": fingerprint, "params": params}, f, default=str)
    return spark.read.parquet(path)


def completed_stages(run_dir: str) -> list[str]:
    """Which stages a previous run finished (for resume diagnostics)."""
    if not os.path.isdir(run_dir):
        return []
    return sorted(
        d for d in os.listdir(run_dir) if _done(os.path.join(run_dir, d))
    )

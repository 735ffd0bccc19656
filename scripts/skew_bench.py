"""Measured skew-defence evidence for the salted candidate-pair join.

The correctness side of the two-path salted join is pinned by
tests/test_blocking.py (salt-invariance on skewed keys); this script
measures the RUNTIME shape — both the wall-clock of the operator as
shipped and, separately, the JOIN-STAGE TASK BALANCE, because the two
tell different stories at different scales:

* **Wall-clock on local[32] understates skew.**  A single in-memory task
  emits tens of millions of join rows per second, so a hot key that
  would pin one executor for hours at 10^12 pairs costs ~3 s locally —
  comparable to the two-path split's own bookkeeping (two block-count
  aggregations + the broadcast anti-join).  Record it anyway, honestly.
* **The largest task's share of the join output is the scale predictor.**
  At 1000 executors an undefended Zipf-hot key caps the join stage at
  ONE core no matter the cluster size; the salted path bounds any task
  at ~1/salt of the hot volume (the probe side is salted into ``salt``
  sub-keys; the build side replicates across them, so each of the
  ``salt`` cells emits hot²/salt rows).  This is measured directly on
  ``_candidate_pairs_raw`` (the join WITHOUT the final pair dedup, whose
  even pair-hash re-shuffle would mask the join stage) via
  ``spark_partition_id()`` row counts — post-AQE, so the ``aqe_only``
  leg also shows how much OptimizeSkewedJoin's runtime split recovers
  without any salting.

Input is synthesised deterministically (no external data): one hot
block key shared by ``--hot`` ids per side (pair product hot², far past
``hot_threshold``) over a background of ``--cold-keys`` uniform keys of
~``--cold-size`` members each — the textbook Zipf head + tail.  Three
legs, each in a fresh JVM, min-of-``--reps`` wall-clock:

* ``salted``    — salt=8 two-path join, AQE on (shipping configuration);
* ``aqe_only``  — salt=1, AQE skew-join left as the only defence;
* ``undefended``— salt=1, AQE skew-join off: the single-reducer
                  straggler baseline.

Auto-broadcast is DISABLED in every leg (explicit ``F.broadcast`` hints
— the hot-key list, by design tiny — still apply): at bench scale the
whole 40k-row block index fits Spark's 10 MB broadcast threshold and
the join never shuffles at all, which silently measures nothing — at
10^12 rows the index cannot broadcast and the join is a shuffle join,
which is the regime the defence exists for.

Run:  python scripts/skew_bench.py [--hot 8000] [--cold-keys 4000]
      [--cold-size 8] [--salt 8] [--reps 3] [--cpus 32]

Prints one JSON line; results recorded in BENCH.md next to the scaling
samples.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_session(cpus: int, aqe: bool):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"skew-bench-aqe{int(aqe)}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
        # force the shuffle-join regime the defence targets (see module
        # docstring); explicit broadcast() hints still apply
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    return b.getOrCreate()


def _blocks(spark, hot: int, cold_keys: int, cold_size: int):
    """(block_key, block_id) index: one hot key + a uniform cold tail."""
    from pyspark.sql import functions as F

    hot_rows = spark.range(hot).select(
        F.lit("hot-key").alias("block_key"),
        F.concat(F.lit("h"), F.col("id")).alias("block_id"),
    )
    cold_rows = spark.range(cold_keys * cold_size).select(
        F.concat(F.lit("cold-"), (F.col("id") % cold_keys)).alias("block_key"),
        F.concat(F.lit("c"), F.col("id")).alias("block_id"),
    )
    return hot_rows.unionByName(cold_rows)


def _run_leg(cpus: int, aqe: bool, salt: int, hot: int, cold_keys: int,
             cold_size: int, reps: int) -> dict:
    """Fresh session per leg so AQE flags and codegen caches can't bleed."""
    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from osm_wikidata_spark.operators.blocking import (
        _candidate_pairs_raw,
        salted_pair_join,
    )

    spark = _build_session(cpus, aqe)
    try:
        blocks = _blocks(spark, hot, cold_keys, cold_size)
        blocks.localCheckpoint(eager=True)  # warm the input path once
        times = []
        n_pairs = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            pairs = salted_pair_join(blocks, blocks, salt=salt).filter(
                F.col("left_id") < F.col("right_id")
            )
            n_pairs = pairs.count()
            times.append(round(time.monotonic() - t0, 3))

        # join-stage balance: per-task row counts of the raw two-path
        # join (pre-dedup — the dedup's even pair-hash shuffle would
        # hide the join tasks).  spark_partition_id() is stamped in the
        # stage that PRODUCES the row, i.e. the join itself, post-AQE.
        raw = _candidate_pairs_raw(blocks, blocks, salt, 65536)
        per_task = (
            raw.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.sum("count").alias("total"),
                F.count("*").alias("n_tasks"),
            )
            .first()
        )
        return {
            "seconds": min(times),
            "all_runs": times,
            "pairs": n_pairs,
            "join_rows": per_task["total"],
            "join_tasks": per_task["n_tasks"],
            "max_task_rows": per_task["mx"],
            "max_task_share": round(per_task["mx"] / per_task["total"], 4),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=8000)
    ap.add_argument("--cold-keys", type=int, default=4000)
    ap.add_argument("--cold-size", type=int, default=8)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    legs = {
        "salted": dict(aqe=True, salt=args.salt),
        "aqe_only": dict(aqe=True, salt=1),
        "undefended": dict(aqe=False, salt=1),
    }
    out = {
        "metric": "skew_defence",
        "unit": "sec+share",
        "hot": args.hot,
        "cold_keys": args.cold_keys,
        "cold_size": args.cold_size,
        "salt": args.salt,
        "cpus": args.cpus,
        "reps": args.reps,
        "legs": {},
    }
    for name, cfg in legs.items():
        out["legs"][name] = _run_leg(
            args.cpus, cfg["aqe"], cfg["salt"], args.hot, args.cold_keys,
            args.cold_size, args.reps,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

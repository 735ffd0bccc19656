"""Survivorship: consolidate each entity cluster into one golden record.

After transitive clustering (operators/components.py) an entity is a SET of
records; the master-data-management step the ER literature calls
survivorship (or data fusion, Bleiholder & Naumann 2008) picks one value
per attribute.  The reference has a single hard-coded policy for its OSM
candidates (pick the unique surviving candidate, matcher.py 1:1 rules —
implemented in operators/resolve.py); this operator is the general,
rule-driven form for multi-record clusters.

Rules (all deterministic, ties broken by value ordering so reruns and
engines agree):

* ``mode``    — most frequent value; ties → smallest value.  Needs one
  extra (cluster, value) aggregation per attribute.
* ``longest`` — longest string; ties → largest lexicographically (one
  ``max(struct(length, value))`` inside the main agg).
* ``max`` / ``min`` — plain extremes.

Scale shape: one groupBy(cluster) computes every non-mode attribute;
each ``mode`` attribute adds one (cluster, value) pre-aggregation whose
output is bounded by distinct values per cluster, then joins back on the
cluster key.  Null values never win a rule unless the cluster is all-null
(Spark aggregates skip nulls; mode counts them out explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_RULES = ("mode", "longest", "max", "min")


def golden_records(
    records: DataFrame,
    cluster_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """One row per cluster: ``(cluster_col, n_records, <attr>...)`` with
    each attribute consolidated under its survivorship rule."""
    bad = {c: r for c, r in rules.items() if r not in _RULES}
    if bad:
        raise ValueError(f"unknown survivorship rules: {bad}; pick from {_RULES}")

    direct_aggs = [F.count("*").alias("n_records")]
    for col, rule in rules.items():
        if rule == "longest":
            direct_aggs.append(
                F.max(F.struct(F.length(col).alias("l"), F.col(col).alias("v")))[
                    "v"
                ].alias(col)
            )
        elif rule == "max":
            direct_aggs.append(F.max(col).alias(col))
        elif rule == "min":
            direct_aggs.append(F.min(col).alias(col))
    out = records.groupBy(cluster_col).agg(*direct_aggs)

    for col, rule in rules.items():
        if rule != "mode":
            continue
        counts = (
            records.filter(F.col(col).isNotNull())
            .groupBy(cluster_col, col)
            .agg(F.count("*").alias("_n"))
        )
        # min(struct(-count, value)) = highest count, ties → smallest value
        winner = counts.groupBy(cluster_col).agg(
            F.min(F.struct((-F.col("_n")).alias("neg"), F.col(col).alias("v")))[
                "v"
            ].alias(col)
        )
        out = out.join(winner, cluster_col, "left")

    ordered = [cluster_col, "n_records"] + list(rules)
    return out.select(*ordered)

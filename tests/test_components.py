"""Connected components vs a union-find oracle (SURVEY.md §7 stage 4)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from osm_wikidata_spark.operators.components import connected_components


def _union_find(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalise: min element of each set
    return {x: find(x) for x in parent}


def _check(spark, edges: list[tuple[str, str]]) -> None:
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _union_find(edges)
    assert got == want


def test_chain(spark):
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(20)]
    _check(spark, edges)


def test_star_and_islands(spark):
    edges = [("hub", f"leaf{i}") for i in range(10)]
    edges += [("iso1", "iso2"), ("x1", "x2"), ("x2", "x3")]
    _check(spark, edges)


def test_random_graphs(spark):
    rng = random.Random(42)
    nodes = [f"v{i:03d}" for i in range(60)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(70)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_self_loops_and_duplicates(spark):
    edges = [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b"), ("c", "c")]
    df = spark.createDataFrame(edges, "left_id string, right_id string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    # pure self-loop nodes vanish (singletons are the pipeline's concern)
    assert got == {"a": "a", "b": "a"}

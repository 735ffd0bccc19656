"""Similarity search over embedding columns (driver mandate).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane LSH
variant as the scale path.  Dot products run JVM-side via ``zip_with`` +
``aggregate`` higher-order functions — no Python in the hot loop.

Scale: brute force is O(N·Q); at 100 TB use the LSH variant, whose bucket
join turns the cross product into per-bucket joins (signature planes are a
small broadcast literal).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, functions as F

from .blocking import top_k_per_group


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the corpus.

    Returns (query_id, vec_id, cos) — the per-query k best corpus vectors.
    """
    joined = vectors.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos"),
    )
    return top_k_per_group(
        joined, "query_id", "cos", k, ascending=False, tiebreak=["vec_id"]
    ).select("query_id", "vec_id", F.round("cos", 6).alias("cos"))


def hyperplane_signature(vec_col: F.Column, dim: int, n_planes: int = 16, seed: int = 42) -> F.Column:
    """Random-hyperplane LSH signature: bit b = sign(v · r_b).

    Planes are seeded literals — identical on every executor and across runs.
    """
    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]
    bits = [
        F.when(
            dot(vec_col, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: exact rerank within matching hyperplane buckets.

    Recall < 1 by construction; pair with multiple tables (re-run with other
    seeds and union) when higher recall is needed.
    """
    sig = hyperplane_signature(F.col(vec_col), dim, n_planes)
    qsig = hyperplane_signature(F.col(query_vec_col), dim, n_planes)
    bucketed = vectors.withColumn("bucket", sig)
    bucketed_q = queries.withColumn("bucket", qsig)
    joined = bucketed.join(F.broadcast(bucketed_q), "bucket").select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos"),
    )
    return top_k_per_group(
        joined, "query_id", "cos", k, ascending=False, tiebreak=["vec_id"]
    ).select("query_id", "vec_id", F.round("cos", 6).alias("cos"))


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment against a fixed centroid codebook (broadcast
    literal).  The codebook would come from a sampled k-means offline; here
    it is supplied by the caller, keeping the operator deterministic."""
    scored = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.array(
            *[
                cosine(F.col(vec_col), F.array(*[F.lit(x) for x in c]))
                for c in centroids
            ]
        ).alias("cell_scores"),
    )
    return scored.select(
        id_col,
        vec_col,
        (F.array_position("cell_scores", F.array_max("cell_scores")) - 1).alias("cell"),
    )

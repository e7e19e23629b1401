"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, fully JVM-side (``F.zip_with`` /
``F.aggregate`` — no Python in the hot path).  Scale path: random-
hyperplane LSH bucketing — candidates share the query's bucket (with
multiprobe over 1-bit flips), then exact cosine within candidates.
Planes are drawn from a seeded generator and broadcast, so bucketing is
deterministic and identical across runs/cluster sizes.

Also: embedding-cosine near-duplicate pairs (the embedding leg of the
dedup suite, operators/dedup.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_to_query(df: DataFrame, query_vec: list[float], vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(query_vec))
    return df.withColumn(
        "cosine",
        _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)),
    )


def cosine_topk_brute(
    df: DataFrame, query_vec: list[float], k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine — one scan + TakeOrderedAndProject."""
    return (
        cosine_to_query(df, query_vec, vec_col)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def random_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def rp_bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket id under the given hyperplanes (JVM-side)."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col), arr) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit, j)
    return bucket.cast("int")


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: np.ndarray | None = None,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to vectors in the
    query's LSH bucket and its `multiprobe`-bit-flip neighbors, then
    brute-force within candidates.  At 10^12 scale the bucket column is
    a partition key: the scan prunes to ~(1+n_planes)/2^n_planes of the
    data."""
    if planes is None:
        planes = random_planes(len(query_vec), n_planes, seed)
    qbits = int(sum((1 << j) for j, p in enumerate(planes) if float(np.dot(p, query_vec)) >= 0))
    probe = {qbits}
    if multiprobe >= 1:
        probe |= {qbits ^ (1 << j) for j in range(len(planes))}
    cand = df.withColumn("_bucket", rp_bucket_expr(vec_col, planes)).where(
        F.col("_bucket").isin(sorted(probe))
    )
    return cosine_topk_brute(cand, query_vec, k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: np.ndarray | None = None,
    n_planes: int = 10,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: bucket self-join (LSH blocked),
    exact cosine filter ≥ threshold."""
    if planes is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = random_planes(dim, n_planes, seed)
    withb = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("_bucket", rp_bucket_expr("v", planes))
    a, b = withb.alias("a"), withb.alias("b")
    pairs = (
        a.join(b, "_bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                _dot(F.col("a.v"), F.col("b.v"))
                / (_norm(F.col("a.v")) * _norm(F.col("b.v")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )
    return pairs

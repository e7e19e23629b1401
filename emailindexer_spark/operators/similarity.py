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


def embedding_near_dup_pairs_banded(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tables: int = 4,
    planes_per_table: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Multi-table (banded) LSH near-dup pairs — the skew-bounded scale
    variant of :func:`embedding_near_dup_pairs`.

    ``tables`` independent plane sets (seeded ``seed + 1000·t``); a pair
    is a candidate if it shares a bucket in ANY table, then exact-cosine
    verified.  More planes per table ⇒ exponentially smaller buckets
    (bounding the per-bucket self-join even when embeddings cluster);
    the union over tables restores recall.  Collision probability for
    similarity s: 1 - (1 - p(s)^b)^T with p(s) = 1 - arccos(s)/π."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    withv = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    banded = withv.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        rp_bucket_expr(
                            "v", random_planes(dim, planes_per_table, seed + 1000 * t)
                        ).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["tbl", "bucket"])
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


def ivf_train(
    df: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    iters: int = 5,
    sample: int = 4096,
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: Lloyd k-means on a BOUNDED,
    deterministic sample (the ``sample`` lowest ids — collect stays
    driver-safe at any corpus size), seeded init, fixed iteration
    count, empty clusters re-seeded deterministically.  Standard IVF
    practice trains the quantizer on a sample; assignment (the data-
    sized pass) stays distributed in :func:`ivf_assign`."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(sample)
        .collect()
    )
    x = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    return ivf_train_arrays(x, n_lists=n_lists, seed=seed, iters=iters)


def ivf_train_arrays(
    x: np.ndarray, n_lists: int = 16, seed: int = 42, iters: int = 5
) -> np.ndarray:
    """The numpy Lloyd core of :func:`ivf_train`, callable on a raw
    (sample, dim) float64 matrix — the oracle generator feeds it the
    SAME deterministic sample read via pyarrow (no Spark) and inlines
    the identical trained centroids as SQL literals."""
    rng = np.random.default_rng(seed)
    n_lists = min(n_lists, len(x))
    cents = x[rng.choice(len(x), size=n_lists, replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties → lowest centroid id
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
            else:  # re-seed an empty list with the farthest point
                cents[c] = x[d2.min(axis=1).argmax()]
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, v, list_id): nearest-centroid assignment, Arrow-batched
    numpy matmul (‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ties → lowest list id).
    At scale the output is written ``partitionBy("list_id")`` so probes
    prune partitions."""
    import pandas as pd

    c = centroids.astype(np.float64)
    cn = (c * c).sum(axis=1)

    def _nearest(vs):
        x = np.array(vs.tolist(), dtype=np.float64)
        d = x @ c.T * (-2.0) + cn[None, :]  # ‖x‖² constant per row — argmin-safe
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    nearest = F.pandas_udf(_nearest, "int")
    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("list_id", nearest(F.col("v")))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: rank inverted lists by centroid distance
    to the query, scan only the ``nprobe`` nearest lists, exact-cosine
    re-rank within.  The classic coarse-quantizer ANN (IVF-Flat);
    deterministic end-to-end (seeded sample-trained quantizer), so
    results are stable across runs and partitionings."""
    if centroids is None:
        centroids = ivf_train(df, n_lists, vec_col, id_col, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    cand = assigned.where(F.col("list_id").isin(probes)).select(
        F.col("id").alias(id_col), F.col("v").alias(vec_col)
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

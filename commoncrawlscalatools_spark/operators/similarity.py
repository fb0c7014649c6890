"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a narrow map (codegen'd
zip_with/aggregate dot product, no UDF) followed by TakeOrderedAndProject;
scales linearly and shuffles only k rows per partition.

Scale path: LSH bucketing by random-hyperplane signs (deterministic planes
derived from a hash formula, not RNG state) — candidates share a bucket, so
the search space drops by ~2^n_planes; exact cosine re-rank inside buckets.
An IVF variant (k-means coarse quantizer) would use the same
bucket-join shape; hyperplane LSH avoids an iterative training job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity to a literal query
    vector. orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-k then a k-row merge on the driver — no global sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def hyperplane(seed: int, plane_id: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d is a hash of
    (seed, plane_id, d) mapped to [-1, 1). Reproducible in any engine."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{plane_id}:{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) % 2000) / 1000.0 - 1.0)
    return out


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = bit-packed signs of dot(vec, plane_j)."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(_as_double(vec), p) >= 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
    return bucket


def lsh_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """ANN: restrict exact scoring to the query's LSH bucket. At 100 TB the
    bucket column is precomputed+partitioned at write time, so a query scans
    one partition (partition pruning) instead of the full table."""
    dim = len(query_vec)
    planes = [hyperplane(seed, j, dim) for j in range(n_planes)]
    q_bucket = 0
    for j, plane in enumerate(planes):
        if sum(float(a) * float(b) for a, b in zip(query_vec, plane)) >= 0:
            q_bucket |= 1 << j
    bucketed = df.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))
    return cosine_topk(
        bucketed.filter(F.col("bucket") == q_bucket), query_vec, vec_col, id_col, k
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_vec: str,
    right_vec: str,
    left_id: str,
    right_id: str,
    k: int = 5,
) -> DataFrame:
    """k nearest right-rows per left-row (brute force, broadcast left if
    small). Window top-k keeps it fully distributed."""
    from pyspark.sql import Window as W

    j = F.broadcast(left.select(left_id, left_vec)).crossJoin(
        right.select(right_id, right_vec)
    )
    scored = j.select(
        F.col(left_id),
        F.col(right_id),
        F.round(cosine(_as_double(F.col(left_vec)), _as_double(F.col(right_vec))), 6).alias("cos_sim"),
    )
    w = W.partitionBy(left_id).orderBy(F.desc("cos_sim"), F.col(right_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")

"""Scan-parallelism guard shared by the per-row-heavy operators.

A small parquet table arrives as ONE scan partition (one file, one row
group — unsplittable), so a zero-shuffle expression pipeline serializes
every row's work onto a single task no matter how many cores the session
has. `spread` hash-repartitions such inputs to the session's default
parallelism BEFORE the heavy per-row work; the shuffle moves the narrow
input projection once (cheap) and unlocks full-width execution of
everything downstream. At real scale the input already has >= parallelism
partitions and this is a partition-count no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition to default parallelism when the input has fewer
    partitions (guide §2: scale-adaptive partitioning — derived from the
    session, never a constant)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df

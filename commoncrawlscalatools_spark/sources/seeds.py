"""Deterministic synthetic seed-URL generator.

Stands in for the reference's wet.paths manifest load
(loadwetpaths.scala:350-409): the reference seeds its frontier from a
manifest of ~10^5 archive URLs; at 10^10-URL frontier scale the seed list
is itself a distributed table. This generator is a pure function of
(seed, n) built from `spark.range` + hash arithmetic — no RNG state, no
Python in the row path — so any executor count produces the identical
seed set, and it scales to arbitrary n without driver memory.

The generated URLs deliberately exercise canonicalization (uppercase
hosts, default ports, fragments, unsorted query params, duplicates) and
host skew (quadratic concentration onto low host ids → hot hosts), per
FIXTURES.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_seeds(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_hosts: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Seed table: (url string, priority double)."""
    n_hosts = n_hosts or max(10, n // 50)
    default_parts = max(
        spark.sparkContext.defaultParallelism, min(2048, n // 250_000)
    )
    df = spark.range(0, n, 1, partitions or default_parts)
    from commoncrawlscalatools_spark.exprcache import cached_expr

    url, priority = cached_expr(
        "seed_url_priority", lambda: _seed_exprs(n, seed, n_hosts), n, seed, n_hosts
    )
    return df.select(url.alias("url"), priority.alias("priority"))


def _seed_exprs(n: int, seed: int, n_hosts: int):
    h = F.xxhash64(F.col("id"), F.lit(seed))
    u = (F.pmod(h, F.lit(1_000_000)).cast("double") / 1_000_000.0)
    # quadratic skew: many URLs land on low host ids (hot hosts)
    host_idx = F.floor(F.lit(float(n_hosts)) * u * u).cast("long")
    host = F.concat(F.lit("host"), host_idx, F.lit(".example.com"))
    # canonicalization noise, keyed off independent hash bits
    h2 = F.xxhash64(F.col("id"), F.lit(seed + 1))
    host_cased = F.when(F.pmod(h2, 3) == 0, F.upper(host)).otherwise(host)
    port = F.when(F.pmod(h2, 5) == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(F.lit("/page/"), F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(max(1, n // 2))))
    query = F.when(F.pmod(h2, 4) == 0, F.lit("?b=2&a=1")).otherwise(
        F.when(F.pmod(h2, 4) == 1, F.lit("?a=1&b=2")).otherwise(F.lit(""))
    )
    frag = F.when(F.pmod(h2, 7) == 0, F.lit("#section")).otherwise(F.lit(""))
    url = F.concat(F.lit("https://"), host_cased, port, path, query, frag)
    priority = F.round(F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(1000)).cast("double") / 1000.0, 3)
    return url, priority

"""robots.txt exclusion + per-host crawl-delay lookup.

New capability required by the north rule (the reference enforced
politeness only via sleeps — ProcessWETPaths.scala:70,110; it had no
robots handling). Rules live in a `robots` table
(host, disallow_prefixes array<string>, crawl_delay_ms bigint) —
FIXTURES.md §4 — which is small relative to the frontier (one row per
host), so it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY_MS = 1000


def url_path(url: F.Column) -> F.Column:
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)


def apply_robots(
    candidates: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop candidates whose path starts with any disallowed prefix for
    their host. Broadcast join + an `exists` over the prefix array — all
    codegen'd; unknown hosts pass."""
    path = url_path(F.col(url_col))
    joined = candidates.join(
        F.broadcast(robots.select(host_col, "disallow_prefixes")), host_col, "left"
    )
    blocked = F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists("disallow_prefixes", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    return joined.filter(~blocked).drop("disallow_prefixes")


def host_delays(robots: DataFrame, host_col: str = "host") -> DataFrame:
    return robots.select(
        host_col,
        F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)).alias(
            "crawl_delay_ms"
        ),
    )


def generate_robots(
    spark: SparkSession, n_hosts: int, seed: int = 42, frac_with_rules: float = 0.3
) -> DataFrame:
    """Deterministic synthetic robots table for the sandbox: ~30% of hosts
    disallow one or two path prefixes; crawl delays 200–2200 ms."""
    df = spark.range(n_hosts)
    h = F.xxhash64(F.col("id"), F.lit(seed + 100))
    host = F.concat(F.lit("host"), F.col("id"), F.lit(".example.com"))
    has_rules = F.pmod(h, F.lit(1000)) < int(frac_with_rules * 1000)
    prefixes = F.when(
        has_rules & (F.pmod(h, 2) == 0),
        F.array(F.lit("/private"), F.lit("/admin")),
    ).when(has_rules, F.array(F.lit("/private")))
    delay = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 101)), F.lit(2000)) + 200).cast(
        "long"
    )
    return df.select(
        host.alias("host"),
        prefixes.alias("disallow_prefixes"),
        delay.alias("crawl_delay_ms"),
    )

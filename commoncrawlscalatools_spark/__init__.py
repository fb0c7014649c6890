"""commoncrawlscalatools_spark — a from-scratch PySpark-native analytics
engine with the query and data-processing capabilities of
jeffharwell/CommonCrawlScalaTools, re-architected for Spark.

Reference (read-only, studied for semantics only): /root/reference/

Architecture (see SURVEY.md §7):
  functions/   — URL canonicalization, hashing, text statistics, cleaning
                 (native pyspark.sql.functions first; Arrow/pandas UDFs only
                 where string-state semantics demand it)
  operators/   — stream/topic filters, dedup (exact/minhash/simhash/jaccard),
                 similarity search, relevance, frontier scheduling, URL-seen
  sources/     — WET-record parsing, synthetic deterministic fetch, seeds
  plans/       — crawl round-loop driver with snapshot checkpoint/resume
  streaming/   — Structured Streaming surface (windowed aggs, sessionization)

Design rules (from BASELINE.json north_rule):
  * DataFrame/SQL declarative plans; Catalyst + AQE pick physical strategy.
  * No per-row Python: vectorized pandas/Arrow UDFs only, and only where
    built-in functions cannot express the semantics.
  * All ordering derives from data (hashes, explicit sort keys) — never from
    partition layout — so results are identical at any parallelism level.
  * Crawl state (frontier, URL-seen, Bloom bytes, per-host timestamps) lives
    in snapshot-versioned tables (Iceberg in production; a parquet-backed
    snapshot store in this sandbox), merged once per round.
"""

__version__ = "0.1.0"

from commoncrawlscalatools_spark.session import get_spark, load_tables  # noqa: F401

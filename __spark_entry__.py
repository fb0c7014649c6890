"""Driver contract for the spark-graft builder (PySpark target).

entry()   — flagship: one full crawl-pipeline pass (seeds synthesized from
            sf0.001 documents → canonicalize → politeness/priority schedule
            → synthetic fetch → Arrow span extraction) returning the
            interleaved-document DataFrame (doc_id, spans, outlinks, ...).
queries() — every implemented operator from SURVEY.md §2 (see
            commoncrawlscalatools_spark/queries.py).
oracle_sql() — DuckDB-equivalent SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl one frontier round end-to-end (in-memory state)."""
    from commoncrawlscalatools_spark.operators.frontier import (
        as_frontier_rows,
        canonicalize_seeds,
        schedule_round,
    )
    from commoncrawlscalatools_spark.queries import _urls_df
    from commoncrawlscalatools_spark.sources.fetch import doc_text, fetch_and_extract

    urls = _urls_df(spark, SF0001)
    seeds = urls.select("url", (F.col("doc_id") % 100 / 100.0).alias("priority"))
    frontier = as_frontier_rows(canonicalize_seeds(seeds), 0)
    sched = schedule_round(
        frontier, host_state=None, robots_delays=None, round_no=1, per_host_cap=50
    )
    docs = fetch_and_extract(sched, n_hosts=100)
    return doc_text(docs).select(
        "doc_id",
        "url",
        "host",
        "round",
        "fetch_seq",
        "not_before_ms",
        "spans",
        "outlinks",
        "n_text_spans",
        "n_media_spans",
        "text",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from commoncrawlscalatools_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from commoncrawlscalatools_spark.queries import all_oracles

    return all_oracles()

"""Freeze a small multi-round CrawlEngine store as the report-job fixture
(tests/fixtures/report_store): the input data for the gated
`parse_progress_report` / `docs_by_category_report` queries, which
re-express the reference's operational monitoring jobs
(reportOnCommonCrawlParseProgress.scala:21-46,
reportOnDocumentsParsedByCategory.scala:30-60) over the engine's OWN
scheduling/document tables.

The fixture is engine OUTPUT frozen as query INPUT — the oracle and the
Spark query both read these same parquet files, so the report queries'
ratio/count semantics (not the store contents) are what the oracle
verifies; store-content correctness is held by the crawl pytest suite.
Regenerate with a reviewed diff only:

    python tools/make_report_store.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawlscalatools_spark import get_spark  # noqa: E402
from commoncrawlscalatools_spark.operators.robots import generate_robots  # noqa: E402
from commoncrawlscalatools_spark.plans.crawl import CrawlConfig, CrawlEngine  # noqa: E402
from commoncrawlscalatools_spark.sources.seeds import generate_seeds  # noqa: E402

DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "report_store",
)


def main():
    spark = get_spark(cores=8, shuffle_partitions=8)
    shutil.rmtree(DEST, ignore_errors=True)
    eng = CrawlEngine(
        spark,
        DEST,
        CrawlConfig(
            per_host_cap=8,
            n_hosts=30,
            doc_coalesce=1,
            bloom_buckets=4,
            bloom_bits=1 << 14,
            fail_permille=60,  # inject failures: the progress report's
            max_retries=2,     # errored/retrying rows must be non-empty
            compact_every=None,
        ),
    )
    eng.bootstrap(
        generate_seeds(spark, 800, seed=42, n_hosts=30),
        generate_robots(spark, 30, seed=42),
    )
    metrics = eng.run(3)
    for m in metrics:
        print({k: m[k] for k in ("round", "scheduled", "fetched_docs",
                                 "failed_fetches", "retrying_urls", "failed_urls")})
    # keep the fixture lean: session scratch only
    for crumb in ("_SUCCESS",):
        pass
    print("frozen at", DEST)


if __name__ == "__main__":
    main()

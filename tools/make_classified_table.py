"""Freeze the classifier job's output table into the report-store fixture
(tests/fixtures/report_store/classified_warc_document) — the engine's twin
of pilotparse.classified_warc_document_v2, the sink of
generateClassifierStatisticsFromRandomWETPathsV2.scala (VERDICT r5 next #4).

The table is computed by the SAME gated query (classifier_statistics) that
the driver value-checks against the padded-RE2 DuckDB oracle, so the frozen
rows' SEMANTICS are independently verified every round; this freeze only
gives the classified_docs_report aggregation a store table to read (the
reference pattern: one job writes the classified table, reporting reads it).

Usage: python tools/make_classified_table.py  (reviewed re-runs only)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawlscalatools_spark import get_spark  # noqa: E402


def main() -> None:
    from commoncrawlscalatools_spark.plans.state import SnapshotStore
    from commoncrawlscalatools_spark.queries import _report_store, classifier_statistics

    from pyspark.sql import functions as F

    spark = get_spark(app="classified-freeze", cores=4, shuffle_partitions=4)
    # stored under the reference's ClassifiedWARCDocument field names
    # (generateClassifierStatisticsFromRandomWETPathsV2.scala:22-27)
    df = classifier_statistics(spark, sf_dir="unused").select(
        F.col("doc_id").alias("warc_record_id"),
        "category",
        F.col("core_count").alias("core_keywords_count"),
        F.col("secondary_count").alias("secondary_keywords_count"),
    )
    store = SnapshotStore(spark, _report_store())
    store.write("classified_warc_document", df, 1, coalesce=1)
    n = store.read("classified_warc_document").count()
    print(f"froze classified_warc_document: {n} rows")


if __name__ == "__main__":
    main()

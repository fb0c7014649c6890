"""Freeze the WET fixture parse output as a golden parquet
(tests/fixtures/wet/expected_records.parquet) so the driver's DuckDB
oracle can value-check the gzip→FSA ingestion path (VERDICT r3 #8 — the
entry was rows-only since round 1).

Derivation note: the per-fixture AGGREGATES (record counts, corruption
routing) are pinned to the reference's ParserSpec by tests/test_wet_gz.py
— that is the independent anchor. This script freezes the full
record-level output (ids, URIs, content lengths, content md5) as the
regression golden; re-run it ONLY after a deliberate, reviewed semantic
change to sources/wet.py.

Usage: python tools/make_wet_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawlscalatools_spark import get_spark  # noqa: E402
from commoncrawlscalatools_spark.queries import wet_fixture_records  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "wet", "expected_records.parquet",
)


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from commoncrawlscalatools_spark.sources import wet as WT

    spark = get_spark(app="wet-golden", cores=4, shuffle_partitions=4)
    fixdir = os.path.dirname(OUT)
    parsed = WT.parse_wet_archive(
        WT.read_wet_gz(spark, os.path.join(fixdir, "*.wet.gz"))
    )
    # superset of wet_fixture_records' columns: warc_filename feeds the
    # archive-lifecycle oracle (file_id of the first valid warcinfo)
    pdf = (
        parsed.withColumn("fixture", F.element_at(F.split("wet_path", "/"), -1))
        .select(
            "fixture",
            "record_pos",
            "record_kind",
            F.col("warc_record_id").alias("record_id"),
            F.col("warc_target_uri").alias("target_uri"),
            "content_length",
            F.md5(F.col("content")).alias("content_md5"),
            "warc_filename",
            # raw content: the filter-evaluation oracle
            # (evaluate_topic_filter_stats) recomputes stream/topic filter
            # stats from the golden text in DuckDB; content_md5 above plus
            # the independent raw-byte parser in tests/test_wet_gz.py pin
            # that this column IS the parsed record content
            "content",
        )
        .orderBy("fixture", "record_pos")
        .toPandas()
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), OUT)
    print(f"wrote {len(pdf)} records -> {OUT}")
    # must equal the gated query's output on the shared columns
    qdf = wet_fixture_records(spark, sf_dir="unused").toPandas()
    assert qdf.equals(pdf[qdf.columns.tolist()]), "golden/query drift"
    print(pdf.groupby(["fixture", "record_kind"]).size())


if __name__ == "__main__":
    main()

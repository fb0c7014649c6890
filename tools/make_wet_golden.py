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

    spark = get_spark(app="wet-golden", cores=4, shuffle_partitions=4)
    pdf = wet_fixture_records(spark, sf_dir="unused").toPandas()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), OUT)
    print(f"wrote {len(pdf)} records -> {OUT}")
    print(pdf.groupby(["fixture", "record_kind"]).size())


if __name__ == "__main__":
    main()

"""Real gzip WET ingestion against the reference's golden fixtures
(tests/fixtures/wet/, from warcparser/src/test/resources/) — ports the
ParserSpec record-count and corruption-recovery assertions
(ParserSpec.scala:142-154, 555-577, 991-1013) onto the actual bytes."""

import os

import pytest
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.sources.wet import (
    conversions_with_info,
    gunzip_concat,
    parse_wet_archive,
    quarantine,
    read_wet_gz,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "wet")


def _fix(name):
    return os.path.join(FIXDIR, name)


@pytest.fixture(scope="module")
def parsed_all(spark):
    df = read_wet_gz(spark, os.path.join(FIXDIR, "*.wet.gz"))
    parsed = parse_wet_archive(df).withColumn(
        "fixture", F.element_at(F.split("wet_path", "/"), -1)
    ).persist()
    yield parsed
    parsed.unpersist()


def _conv_counts(parsed, strict=True):
    conv = conversions_with_info(parsed, strict_info=strict)
    return {
        r["fixture"]: r["n"]
        for r in conv.groupBy("fixture").agg(F.count("*").alias("n")).collect()
    }


def test_fragment3_five_records(parsed_all):
    # ParserSpec:555-567 — 5 WARC conversion records from fragment3.wet.gz
    assert _conv_counts(parsed_all).get("fragment3.wet.gz") == 5


def test_corrupt_conversion_1_skips_corrupt_record(parsed_all):
    # ParserSpec:1007-1013 — 4 records extracted, the corrupt one skipped
    assert _conv_counts(parsed_all).get("corrupt_warcconversion_1.wet.gz") == 4
    q = quarantine(parsed_all).filter(
        F.col("fixture") == "corrupt_warcconversion_1.wet.gz"
    )
    assert q.count() == 1


def test_corrupt_conversion_2_yields_nothing(parsed_all):
    # ParserSpec:334-347 — parses but no valid conversion records
    assert "corrupt_warcconversion_2.wet.gz" not in _conv_counts(parsed_all)


def test_two_warcinfo_skips_extra_info_records(parsed_all):
    # ParserSpec:991-1005 — 5 records, all conversion type; the second
    # warcinfo record is never emitted as a conversion
    conv = conversions_with_info(parsed_all, strict_info=True).filter(
        F.col("fixture") == "corrupt_two_warcinfo.wet.gz"
    )
    rows = conv.collect()
    assert len(rows) == 5
    assert all(r["warc_type"] == "conversion" for r in rows)


def test_starts_with_conversion_strict_yields_nothing(parsed_all):
    # ParserSpec:568-577 + 320-333 — the FSA sinks when the first record is
    # not a valid warcinfo, even though a warcinfo appears later
    assert "corrupt_starts_with_conversion.wet.gz" not in _conv_counts(parsed_all)
    # lenient mode salvages them (documented divergence switch)
    lenient = _conv_counts(parsed_all, strict=False)
    assert lenient.get("corrupt_starts_with_conversion.wet.gz") == 5


def test_corrupt_warcinfo_yields_nothing_strict(parsed_all):
    # ParserSpec:327-331 — corruption, no complete WARCInfo record
    assert "corrupt_warcinfo_1.wet.gz" not in _conv_counts(parsed_all)


def test_headers_only_files_yield_nothing(parsed_all):
    # ParserSpec:219-222 — record count 0 for header-only files
    counts = _conv_counts(parsed_all)
    assert "file_headers_only.wet.gz" not in counts
    assert "file_and_wet_headers_only.wet.gz" not in counts


def test_incomplete_last_record_dropped(parsed_all):
    # fragment1's last conversion declares Content-Length 12694 but carries
    # 9186 bytes (truncated mid-record): the reference parser hits EOF while
    # reading the body and drops it — only the complete record survives
    counts = _conv_counts(parsed_all)
    assert counts.get("fragment1_incomplete_last.wet.gz") == 1
    q = quarantine(parsed_all).filter(
        F.col("fixture") == "fragment1_incomplete_last.wet.gz"
    )
    assert q.count() == 1


def test_concatenated_members_and_unexpected_eof(spark):
    # Reader.scala:25-61 — concatenated gzip members must all decompress;
    # an unexpected EOF in the last member ends the archive without losing
    # already-extracted records
    df = read_wet_gz(spark, _fix("appended_zip_fragment_unexpected_eof.wet.gz"))
    row = df.collect()[0]
    assert row["n_members"] == 16
    assert row["truncated"] is True
    parsed = parse_wet_archive(df)
    conv = conversions_with_info(parsed, strict_info=True)
    # the 16th conversion sits inside the truncated member (3479 of its
    # declared 7758 body bytes survive) — the reference parser hits EOF
    # reading it and keeps the 15 records already extracted
    assert conv.count() == 15
    assert quarantine(parsed).count() == 1


def test_filter_test_file_record_count(parsed_all):
    # ParserSpec:529 comment — filter_test_1 carries 25 conversion records
    assert _conv_counts(parsed_all).get("filter_test_1.wet.gz") == 25


def test_warcinfo_filename_denormalized(parsed_all):
    # ParserSpec:181 — the archive's WARC-Filename reaches every record
    conv = conversions_with_info(parsed_all, strict_info=True).filter(
        F.col("fixture") == "fragment3.wet.gz"
    )
    names = {r["info_filename"] for r in conv.select("info_filename").collect()}
    assert names == {
        "CC-MAIN-20161202170900-00009-ip-10-31-129-80.ec2.internal.warc.wet.gz"
    }


def test_gunzip_concat_plain_single_member():
    import gzip

    blob = gzip.compress(b"hello WET world")
    text, n, truncated = gunzip_concat(blob)
    assert (text, n, truncated) == ("hello WET world", 1, False)


def test_gunzip_concat_multi_member_and_truncation():
    import gzip

    a, b = gzip.compress(b"alpha\n"), gzip.compress(b"beta\n")
    text, n, truncated = gunzip_concat(a + b)
    assert (text, n, truncated) == ("alpha\nbeta\n", 2, False)
    # cut the second member short: keep member 1 + partial member 2
    text, n, truncated = gunzip_concat(a + b[:-6])
    assert truncated is True and n == 1 and text.startswith("alpha\n")


def test_archive_lifecycle_log_messages(parsed_all):
    """W5 finish-trigger strings as data, pinned to ParserSpec:288,331,347,361."""
    from commoncrawlscalatools_spark.sources.wet import archive_lifecycle

    rows = {
        r["wet_path"].split("/")[-1]: r
        for r in archive_lifecycle(parsed_all).collect()
    }
    assert rows["fragment3.wet.gz"]["log_message"] == "File Parsed Normally"
    assert rows["fragment3.wet.gz"]["records_extracted"] == 5
    assert (
        rows["corrupt_warcconversion_1.wet.gz"]["log_message"]
        == "File Parsed - Some corruption detected"
    )
    assert rows["corrupt_warcconversion_1.wet.gz"]["records_extracted"] == 4
    assert (
        rows["corrupt_warcconversion_2.wet.gz"]["log_message"]
        == "File Parse Error - Corruption detected and no WARC Conversion "
        "records were extracted"
    )
    for f in ("corrupt_warcinfo_1.wet.gz", "corrupt_starts_with_conversion.wet.gz"):
        assert (
            rows[f]["log_message"]
            == "File Parse Error - Corruption detected, was not able to find "
            "complete WARCInfo record"
        )
        assert rows[f]["records_extracted"] == 0
    assert (
        rows["fragment3.wet.gz"]["file_id"]
        == "CC-MAIN-20161202170900-00009-ip-10-31-129-80.ec2.internal.warc.wet.gz"
    )


def test_stream_filter_and_topic_on_real_records(parsed_all):
    """End-to-end on REAL CommonCrawl text (filter_test_1's 25 conversion
    records): the two-phase FourForums stream filter + topic categorizer
    run over actual record content. Regression pin: exactly one record
    passes the keyword gate and categorizes as 'evolution' (engine pin on
    real bytes; the reference has no filter-attached count for this file)."""
    from commoncrawlscalatools_spark.operators.filters import (
        stream_filter,
        topic_categorize,
    )

    conv = conversions_with_info(parsed_all, strict_info=True).filter(
        F.col("fixture") == "filter_test_1.wet.gz"
    )
    kept = stream_filter(conv, text_col="content", minmentions=1)
    rows = topic_categorize(kept, text_col="content").collect()
    assert len(rows) == 1
    assert list(rows[0]["categories"]) == ["evolution"]


def test_golden_record_fields_pinned_to_raw_fixture_bytes():
    """ADVICE r4 #1 (golden circularity): the frozen golden parquet is
    generated by the engine's own parser, so this test re-derives the
    record-level fields (id, target URI, content length, content md5)
    straight from the RAW fixture bytes with an INDEPENDENT minimal
    parser — plain gzip + byte-offset header walk, no FSA, no Spark —
    and pins the golden's clean-fixture rows against it. Any semantic
    divergence frozen into the golden would break here."""
    import gzip
    import hashlib
    import os

    import pandas as pd

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures", "wet")
    golden = pd.read_parquet(os.path.join(fixdir, "expected_records.parquet"))

    def naive_parse(path):
        """Independent re-derivation: split records on 'WARC/1.0\\r\\n',
        read headers up to the blank line, slice exactly Content-Length
        bytes of payload."""
        raw = gzip.open(path, "rb").read()
        out = []
        pos = 0
        while True:
            start = raw.find(b"WARC/1.0\r\n", pos)
            if start < 0:
                break
            hdr_end = raw.find(b"\r\n\r\n", start)
            headers = {}
            for line in raw[start:hdr_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b": ")
                headers[k.decode()] = v.decode()
            clen = int(headers["Content-Length"])
            body = raw[hdr_end + 4 : hdr_end + 4 + clen]
            # the REFERENCE trims record content (Parser.scala:315 reads
            # Content-Length+2 bytes then .trim()) — apply the same
            # documented transform to the raw slice
            content = body.decode("utf-8").strip()
            out.append(
                {
                    "record_kind": headers["WARC-Type"],
                    "record_id": headers["WARC-Record-ID"],
                    "target_uri": headers.get("WARC-Target-URI"),
                    "content_length": clen,
                    "content_md5": hashlib.md5(content.encode("utf-8")).hexdigest(),
                }
            )
            pos = hdr_end + 4 + clen
        return out

    # clean fixtures: every raw record is complete and valid, so the
    # engine's output must match the naive byte walk 1:1
    for fixture in ("fragment3.wet.gz", "filter_test_1.wet.gz"):
        raw_records = naive_parse(os.path.join(fixdir, fixture))
        g = golden[golden.fixture == fixture].sort_values("record_pos")
        assert len(g) == len(raw_records), fixture
        for grow, rrec in zip(g.itertuples(index=False), raw_records):
            assert grow.record_kind == rrec["record_kind"], (fixture, grow)
            assert grow.record_id == rrec["record_id"], (fixture, grow)
            assert grow.target_uri == rrec["target_uri"], (fixture, grow)
            assert int(grow.content_length) == rrec["content_length"], (fixture, grow)
            # content bytes themselves: md5 over the raw Content-Length
            # slice must equal the engine's md5 over its parsed content
            assert grow.content_md5 == rrec["content_md5"], (fixture, grow)

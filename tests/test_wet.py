"""WET-record parsing: corruption quarantine semantics mirroring
ParserSpec ('return 4 WARCRecord objects skipping corrupt record')."""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.sources.wet import (
    conversions_with_info,
    parse_wet_archive,
    quarantine,
    validate_fixture_records,
)


def _conv(uri, rid, body, extra=""):
    return (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2023-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        "WARC-Refers-To: <urn:uuid:ref>\r\n"
        "WARC-Block-Digest: sha1:abc\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"{extra}"
        "\r\n"
        f"{body}\r\n\r\n"
    )


_INFO = (
    "WARC/1.0\r\n"
    "WARC-Type: warcinfo\r\n"
    "WARC-Date: 2023-01-01T00:00:00Z\r\n"
    "WARC-Filename: test.warc.wet.gz\r\n"
    "WARC-Record-ID: <urn:uuid:info>\r\n"
    "Content-Type: application/warc-fields\r\n"
    "Content-Length: 10\r\n"
    "\r\n"
    "robots: ok\r\n\r\n"
)


def _archive():
    recs = [
        _conv("https://a.com/1", "r1", "first document body"),
        _conv("https://b.org/2", "r2", "second document body"),
        # corrupt: missing WARC-Target-URI
        _conv("https://c.net/3", "r3", "third body").replace(
            "WARC-Target-URI: https://c.net/3\r\n", ""
        ),
        _conv("https://d.com/4", "r4", "fourth document body"),
        _conv("banana:boat", "r5", "fifth document body"),  # garbage URI, still complete
    ]
    return _INFO + "".join(recs)


def test_parse_recovers_valid_siblings(spark):
    df = spark.createDataFrame([("path1", _archive())], ["wet_path", "archive_text"])
    parsed = parse_wet_archive(df)
    kinds = {r["record_kind"]: 0 for r in parsed.collect()}
    rows = parsed.collect()
    n_conv = sum(1 for r in rows if r["record_kind"] == "conversion")
    n_corrupt = sum(1 for r in rows if r["record_kind"] == "corrupt")
    n_info = sum(1 for r in rows if r["record_kind"] == "warcinfo")
    assert n_info == 1
    assert n_conv == 4  # reference: 4 of 5 recovered
    assert n_corrupt == 1


def test_warcinfo_denormalized_and_tld(spark):
    df = spark.createDataFrame([("path1", _archive())], ["wet_path", "archive_text"])
    conv = conversions_with_info(parse_wet_archive(df)).collect()
    assert all(r["info_filename"] == "test.warc.wet.gz" for r in conv)
    by_id = {r["warc_record_id"]: r for r in conv}
    assert by_id["<urn:uuid:r1>"]["warc_tldn"] == "com"
    assert by_id["<urn:uuid:r2>"]["warc_tldn"] == "org"
    assert by_id["<urn:uuid:r5>"]["warc_tldn"] is None  # garbage URI → no TLD
    assert by_id["<urn:uuid:r1>"]["content"] == "first document body"
    assert by_id["<urn:uuid:r1>"]["content_length_int"] == 19


def test_quarantine_routing(spark):
    df = spark.createDataFrame([("path1", _archive())], ["wet_path", "archive_text"])
    qr = quarantine(parse_wet_archive(df)).collect()
    assert len(qr) == 1 and qr[0]["warc_target_uri"] is None


def test_fixture_record_validation(spark):
    rows = [
        ("p", "conversion", "<id1>", "https://x.com/a", "2023", "10", "body"),
        ("p", "warcinfo", "<id2>", None, "2023", "5", "info"),
        ("p", "conversion", "<id3>", "", "2023", "10", "body"),  # empty URI
        ("p", "bogus-type", "<id4>", "https://x.com/b", "2023", "10", "body"),
    ]
    df = spark.createDataFrame(
        rows,
        ["wet_path", "warc_type", "warc_record_id", "warc_target_uri", "warc_date", "content_length", "content"],
    )
    out = {r["warc_record_id"]: r["record_kind"] for r in validate_fixture_records(df).collect()}
    assert out == {
        "<id1>": "conversion",
        "<id2>": "warcinfo",
        "<id3>": "corrupt",
        "<id4>": "corrupt",
    }


def test_garbage_uri_record_complete_but_no_tld(spark):
    """WARCConversionSpec garbage-URI case: 'blahblahblah' as the target URI
    and a non-numeric Content-Length still make a COMPLETE conversion record
    (header presence is what completeness checks), but the TLD is None."""
    from commoncrawlscalatools_spark.sources.wet import (
        conversions_with_info,
        parse_wet_archive,
    )

    block = (
        "preamble\nWARC/1.0\n"
        "WARC-Type: warcinfo\n"
        "WARC-Date: 2016-12-13T03:22:59Z\n"
        "WARC-Filename: test.warc.wet.gz\n"
        "WARC-Record-ID: <urn:uuid:1>\n"
        "Content-Type: application/warc-fields\n"
        "Content-Length: 18\n"
        "\n"
        "This is my content\n"
        "WARC/1.0\n"
        "WARC-Type: conversion\n"
        "WARC-Target-URI: blahblahblah\n"
        "WARC-Date: 2016-12-13T03:22:59Z\n"
        "WARC-Record-ID: <urn:uuid:2>\n"
        "WARC-Refers-To: my refers to\n"
        "WARC-Block-Digest: my block digest\n"
        "Content-Type: my content type\n"
        "Content-Length: my content length\n"
        "\n"
        "This is my content\n"
    )
    df = spark.createDataFrame([("a.wet", block)], ["wet_path", "archive_text"])
    parsed = parse_wet_archive(df)
    conv = conversions_with_info(parsed, strict_info=True).collect()
    assert len(conv) == 1
    assert conv[0]["record_kind"] == "conversion"  # complete despite garbage
    assert conv[0]["warc_tldn"] is None
    assert conv[0]["content_length_int"] is None

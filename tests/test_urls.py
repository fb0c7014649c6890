"""URL canonicalization + TLD golden tests (reference:
WARCConversionSpec.scala:107-159 — TLD derivation incl. garbage URI)."""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.functions.urls import (
    canonical_url,
    url_hash,
    url_host,
    url_tld,
)

CASES = [
    # (raw, canonical, tld)
    ("https://Example.COM/a", "https://example.com/a", "com"),
    ("https://example.com:443/a", "https://example.com/a", "com"),
    ("http://example.com:80/a", "http://example.com/a", "com"),
    ("http://example.com:8080/a", "http://example.com:8080/a", "com"),
    ("https://example.com", "https://example.com/", "com"),
    ("https://example.com/a#frag", "https://example.com/a", "com"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2", "com"),
    ("https://example.com/a?", "https://example.com/a", "com"),
    ("https://user:pw@example.com/a", "https://example.com/a", "com"),
    ("  https://example.com/a  ", "https://example.com/a", "com"),
    ("HTTPS://EX.org:443/P?z=1&y=2#f", "https://ex.org/P?y=2&z=1", "org"),
    ("not a url", None, None),
    ("http//broken", None, None),
    ("", None, None),
    ("banana:boat", None, None),  # reference garbage-URI case → no TLD
]


def test_canonicalization_goldens(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], ["url"])
    out = df.select(
        "url",
        canonical_url(F.col("url")).alias("canon"),
        url_tld(F.col("url")).alias("tld"),
    ).collect()
    got = {r["url"]: (r["canon"], r["tld"]) for r in out}
    for raw, canon, tld in CASES:
        assert got[raw] == (canon, tld), f"{raw!r}: {got[raw]} != {(canon, tld)}"


def test_url_hash_deterministic(spark):
    df = spark.createDataFrame([("https://a.com/x",)] * 3, ["url"])
    hashes = {
        r[0]
        for r in df.select(url_hash(canonical_url(F.col("url")))).collect()
    }
    assert len(hashes) == 1


def test_host_extraction(spark):
    df = spark.createDataFrame([("https://Sub.Host.ORG:8443/p?q=1",)], ["url"])
    assert df.select(url_host(F.col("url"))).collect()[0][0] == "sub.host.org"

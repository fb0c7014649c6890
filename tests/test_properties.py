"""Property-based robustness (hypothesis) for the pure-Python kernels and
an idempotence fuzz for the canonicalizer — invariants the golden tests
can't sweep: arbitrary unicode, arbitrary gzip member splits, arbitrary
truncation points."""

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from commoncrawlscalatools_spark.functions.cleaner import (
    prepare_document_py,
    tokenize_line,
)
from commoncrawlscalatools_spark.sources.wet import gunzip_concat

TEXTISH = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(
    chunks=st.lists(st.binary(max_size=200), min_size=1, max_size=5),
)
def test_gunzip_concat_roundtrips_members(chunks):
    blob = b"".join(gzip.compress(c) for c in chunks)
    text, n, truncated = gunzip_concat(blob)
    assert n == len(chunks)
    assert truncated is False
    assert text == b"".join(chunks).decode("utf-8", errors="replace")


ASCII_CHUNK = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=200,
).map(lambda s: s.encode())


@settings(max_examples=200, deadline=None)
@given(
    chunks=st.lists(ASCII_CHUNK, min_size=1, max_size=4),
    cut=st.integers(min_value=1, max_value=30),
)
def test_gunzip_concat_truncation_never_loses_complete_members(chunks, cut):
    # ASCII payloads: a multi-byte UTF-8 char spanning a member boundary
    # decodes jointly in the real reader (byte stream concatenation), which
    # a per-chunk expectation can't express
    members = [gzip.compress(c) for c in chunks]
    blob = b"".join(members)
    cut = min(cut, len(members[-1]) - 1)
    truncated_blob = blob[: len(blob) - cut]
    text, n, truncated = gunzip_concat(truncated_blob)
    # every COMPLETE member's plaintext must survive the truncation
    assert n >= len(chunks) - 1
    prefix = b"".join(chunks[: len(chunks) - 1]).decode("utf-8", errors="replace")
    assert text.startswith(prefix)
    if n < len(chunks):
        assert truncated is True


@settings(max_examples=300, deadline=None)
@given(doc=TEXTISH)
def test_cleaner_never_raises_and_output_lines_come_from_input(doc):
    out = prepare_document_py(doc)
    assert isinstance(out, str)
    if out:
        input_lines = doc.replace("\r\n", "\n").split("\n")
        for line in out.split("\n"):
            # every output line is a contiguous slice of some input line
            # (cleanTextBlock slices the block; blocks join kept lines)
            assert any(line in il for il in input_lines), line


@settings(max_examples=300, deadline=None)
@given(line=TEXTISH)
def test_tokenizer_total_and_loss_free_on_nonspace(line):
    toks = tokenize_line(line)
    # tokenization never raises and never yields empty tokens
    assert all(t for t in toks)
    # every alphanumeric character of the input survives tokenization
    # (punctuation may split; quote/bracket tokens rename to treebank
    # forms, whose letters are notation — exclude them on both sides)
    ptb_forms = {"-LRB-", "-RRB-", "-LSB-", "-RSB-", "-LCB-", "-RCB-", "``", "''", "`", "'"}
    renamed = set("()[]{}\"'`“”‘’")
    want = sorted(c for c in "".join(line.split()) if c.isalnum() and c not in renamed)
    got = sorted(
        c for t in toks if t not in ptb_forms for c in t if c.isalnum()
    )
    assert got == want


def test_canonical_url_idempotent_fuzz(spark):
    """canonical(canonical(u)) == canonical(u) over fuzzed URL shapes —
    the URL-seen set is keyed on canonical strings, so idempotence is what
    makes membership stable across crawl generations (north rule)."""
    import random

    from pyspark.sql import functions as F

    from commoncrawlscalatools_spark.functions.urls import canonical_url

    rng = random.Random(42)
    schemes = ["http", "HTTPS", "https"]
    hosts = ["Example.COM", "a.b.ORG", "x-y.net", "WWW.Site.Io"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a/b", "/p/%7Euser", "/a//b"]
    queries = ["", "?b=2&a=1", "?z=9", "?a=1&a=0", "?k"]
    frags = ["", "#x", "#frag/with/slash"]
    urls = []
    for _ in range(400):
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        )
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonical_url(F.col("url")).alias("c1"))
    twice = once.select("c1", canonical_url(F.col("c1")).alias("c2"))
    bad = twice.filter(
        (F.col("c1") != F.col("c2"))
        | F.col("c1").isNull() != F.col("c2").isNull()
    ).collect()
    assert not bad, bad[:5]

"""Fetch + extraction stage: scheduled URLs → interleaved text+media
documents (`spans array<struct<kind,text,media_ref,offset>>`) + outlinks.

Reference analog: ProcessWETPaths.parseWETArchiveURL (HTTPS fetch) +
Parser FSA (ProcessWETPaths.scala:58-208, Parser.scala:818-914), collapsed
into two stages per SURVEY.md S2/S3:

  1. `synthesize_payload` — the sandbox "network": a deterministic raw
     payload string per URL, computed as a pure Catalyst expression of
     url_hash (no RNG, no Python, no IO) so any executor count and any
     re-run produces byte-identical content. In production this stage is
     the real `mapInPandas` HTTP fetch; everything downstream is unchanged.
  2. `extract_documents` — payload → span sequence + outlinks, as an
     Arrow-vectorized `mapInPandas` (the north rule's extraction stage:
     batches in/out via Arrow, no row-at-a-time UDF serialization).

The payload line format ("T:<text>" / "M:<media_ref>" / "L:<outlink url>")
stands in for HTML; span `offset` is the 0-based position in the document,
the order key for span-sequence equality (FIXTURES.md §1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# seeded vocabulary incl. the reference filter keywords (FIXTURES.md §1)
VOCAB = (
    "the quick brown fox jumps over lazy dog data spark shuffle partition "
    "gun guns abortion evolution god strict control pro-life pro-choice "
    "natural mechanism intelligent design atheist theist exist crawl url "
    "frontier fetch parse record archive document span media text link "
    "host robot priority queue bloom filter hash seen round state table "
    "query plan join scan sort window батч vector arrow batch codegen"
).split()

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("media_ref", T.StringType(), True),
            T.StructField("offset", T.IntegerType(), False),
        ]
    )
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("fetch_seq", T.IntegerType(), False),
        T.StructField("not_before_ms", T.LongType(), True),
        T.StructField("spans", SPAN_TYPE, False),
        T.StructField("outlinks", T.ArrayType(T.StringType()), False),
        T.StructField("n_text_spans", T.IntegerType(), False),
        T.StructField("n_media_spans", T.IntegerType(), False),
    ]
)


MAX_SPANS = 12
MAX_LINKS = 5


def synthesize_payload(
    scheduled: DataFrame,
    n_hosts: int = 1000,
    max_page: int = 1_000_000,
    words_per_span: int = 8,
) -> DataFrame:
    """Adds a deterministic `payload` column (pure function of url_hash).

    Deliberately UNROLLED into flat expressions (span/link counts are
    bounded): higher-order functions (transform/filter) are interpreted —
    no whole-stage codegen, boxing per element — and a nested-HOF version
    of this generator pinned every executor thread in
    ArrayTransform.nullSafeEval (jstack-verified), anti-scaling the whole
    crawl round. Flat concat_ws/when/element_at expressions codegen into
    one tight loop. concat_ws skips NULL args, which trims the unroll to
    the per-row span/link counts.
    """
    h = F.col("url_hash")
    vocab = F.lit(VOCAB)
    vsize = len(VOCAB)
    n_spans = (F.pmod(h, MAX_SPANS) + 1).cast("int")
    n_links = F.pmod(F.xxhash64(h, F.lit(1)), MAX_LINKS + 1).cast("int")

    def span_line(i: int) -> Column:
        sh = F.xxhash64(h, F.lit(i), F.lit(2))
        words = [
            F.element_at(
                vocab, (F.pmod(F.xxhash64(sh, F.lit(j)), vsize) + 1).cast("int")
            )
            for j in range(words_per_span)
        ]
        text_line = F.concat(F.lit("T:"), F.concat_ws(" ", *words))
        media_line = F.concat(
            F.lit("M:media://img/"), F.conv(F.pmod(sh, 1 << 40).cast("string"), 10, 16)
        )
        line = F.when(F.pmod(sh, 5) == 0, media_line).otherwise(text_line)
        return F.when(F.lit(i) < n_spans, line)  # NULL beyond n_spans

    def link_line(k: int) -> Column:
        lh = F.xxhash64(h, F.lit(k), F.lit(3))
        host_idx = F.pmod(lh, n_hosts)
        page = F.pmod(F.xxhash64(lh, F.lit(4)), max_page)
        hostname = F.concat(F.lit("host"), host_idx, F.lit(".example.com"))
        # some raw links carry canonicalization noise → exercises the
        # canonicalizer on the feedback loop
        hostname = F.when(F.pmod(lh, 3) == 0, F.upper(hostname)).otherwise(hostname)
        line = F.concat(
            F.lit("L:https://"), hostname, F.lit("/page/"), page,
            F.when(F.pmod(lh, 4) == 0, F.lit("#ref")).otherwise(F.lit("")),
        )
        return F.when(F.lit(k) <= n_links, line)

    lines = [span_line(i) for i in range(MAX_SPANS)] + [
        link_line(k) for k in range(1, MAX_LINKS + 1)
    ]
    payload = F.concat_ws("\n", *lines)
    return scheduled.withColumn("payload", payload)


def extract_documents(with_payload: DataFrame) -> DataFrame:
    """payload → documents with span sequences + outlinks (Arrow batches)."""

    def extract(batches):
        for pdf in batches:
            split = pdf["payload"].str.split("\n")
            spans_col, links_col, ntext, nmedia = [], [], [], []
            for lines in split:
                spans, links, off = [], [], 0
                for line in lines:
                    if line.startswith("T:"):
                        spans.append(
                            {"kind": "text", "text": line[2:], "media_ref": None, "offset": off}
                        )
                        off += 1
                    elif line.startswith("M:"):
                        spans.append(
                            {"kind": "media", "text": None, "media_ref": line[2:], "offset": off}
                        )
                        off += 1
                    elif line.startswith("L:"):
                        links.append(line[2:])
                spans_col.append(spans)
                links_col.append(links)
                ntext.append(sum(1 for s in spans if s["kind"] == "text"))
                nmedia.append(sum(1 for s in spans if s["kind"] == "media"))
            yield pd.DataFrame(
                {
                    "doc_id": "urn:doc:" + pdf["url_hash"].map(lambda x: format(x & ((1 << 64) - 1), "016x")),
                    "url": pdf["url"],
                    "host": pdf["host"],
                    "round": pdf["round"],
                    "fetch_seq": pdf["fetch_seq"],
                    "not_before_ms": pdf["not_before_ms"],
                    "spans": spans_col,
                    "outlinks": links_col,
                    "n_text_spans": ntext,
                    "n_media_spans": nmedia,
                }
            )

    return with_payload.mapInPandas(extract, DOC_SCHEMA)


def fetch_and_extract(scheduled: DataFrame, n_hosts: int = 1000) -> DataFrame:
    """Fetch stage entry. The scheduler hands us host-hash-partitioned rows
    (politeness window output) — hot hosts make those partitions skewed, and
    the fetch/extract cost is per-URL, so we salt-spread by url_hash first
    (north rule: salted repartitioning across hosts, never within a host's
    sequence — fetch order is carried by fetch_seq data, not partition
    order). Measured 3× on the fetch stage at 2M URLs."""
    sc = scheduled.sparkSession.sparkContext
    spread = scheduled.repartition(sc.defaultParallelism * 2, "url_hash")
    return extract_documents(synthesize_payload(spread, n_hosts=n_hosts))


def doc_text(docs: DataFrame) -> DataFrame:
    """Flatten span text for the analytics layer: one `text` column per doc
    (text spans concatenated in offset order — sort_array on offset, never
    collect_list order; SURVEY.md §7.4)."""
    ordered = F.array_sort(
        F.col("spans"), lambda a, b: a["offset"] - b["offset"]
    )
    text = F.array_join(
        F.transform(
            F.filter(ordered, lambda s: s["kind"] == "text"), lambda s: s["text"]
        ),
        " ",
    )
    return docs.withColumn("text", text)

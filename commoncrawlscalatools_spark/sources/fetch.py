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

    The ~600-node unroll costs >1 s of py4j round-trips to CONSTRUCT on
    this box (event-log audit: 2.8 s driver-only time before the first
    task, ~1.2 s of it this construction — charged to every crawl round
    and to the scaling criterion's serial span), so the built expression
    is memoized per SparkContext (exprcache.cached_expr).
    """
    from commoncrawlscalatools_spark.exprcache import cached_expr

    def _build() -> Column:
        return _payload_expr(n_hosts, max_page, words_per_span)

    payload = cached_expr(
        "synthetic_payload", _build, n_hosts, max_page, words_per_span
    )
    return scheduled.withColumn("payload", payload)


def _payload_expr(n_hosts: int, max_page: int, words_per_span: int) -> Column:
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
    return F.concat_ws("\n", *lines)


def extract_documents(with_payload: DataFrame) -> DataFrame:
    """payload → documents with span sequences + outlinks, assembled
    NATIVELY in Arrow (mapInArrow): line split / prefix slice in
    pyarrow.compute, per-document span offsets in numpy, and the nested
    `array<struct>` built directly as a ListArray of StructArray — zero
    per-row Python and zero python-object materialization of spans (the
    round-1 mapInPandas version built a dict per span; this path cut the
    32-thread extract stage ~1.4×). doc_id is computed JVM-side (hex of
    url_hash) so the Arrow stage is pure structure assembly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    doc_id = F.concat(
        F.lit("urn:doc:"), F.lower(F.lpad(F.hex(F.col("url_hash")), 16, "0"))
    )
    src = with_payload.withColumn("__doc_id", doc_id)

    def extract(batches):
        for rb in batches:
            tb = pa.Table.from_batches([rb]).combine_chunks()
            n_docs = tb.num_rows
            payload = tb["payload"].chunk(0) if tb["payload"].num_chunks else pa.array([], pa.string())
            lines = pc.split_pattern(payload, "\n")
            flat = pc.list_flatten(lines)
            parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
            k2 = pc.utf8_slice_codeunits(flat, 0, 2)
            rest = pc.utf8_slice_codeunits(flat, 2, 1 << 30)
            is_t = pc.equal(k2, "T:").to_numpy(zero_copy_only=False)
            is_m = pc.equal(k2, "M:").to_numpy(zero_copy_only=False)
            is_l = pc.equal(k2, "L:").to_numpy(zero_copy_only=False)
            is_span = is_t | is_m

            sp_par = parents[is_span]
            span_counts = np.bincount(sp_par, minlength=n_docs)
            span_starts = np.concatenate(([0], np.cumsum(span_counts)))
            offsets_within = (
                np.arange(len(sp_par)) - span_starts[:-1][sp_par]
                if len(sp_par)
                else np.array([], dtype=np.int64)
            )
            mask_t = pa.array(is_t[is_span])
            rest_span = pc.filter(rest, pa.array(is_span))
            null_str = pa.scalar(None, pa.string())
            structs = pa.StructArray.from_arrays(
                [
                    pc.if_else(mask_t, pa.scalar("text"), pa.scalar("media")),
                    pc.if_else(mask_t, rest_span, null_str),
                    pc.if_else(mask_t, null_str, rest_span),
                    pa.array(offsets_within, type=pa.int32()),
                ],
                ["kind", "text", "media_ref", "offset"],
            )
            spans = pa.ListArray.from_arrays(
                pa.array(span_starts, type=pa.int32()), structs
            )

            link_counts = np.bincount(parents[is_l], minlength=n_docs)
            links = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(link_counts))), type=pa.int32()),
                pc.filter(rest, pa.array(is_l)),
            )

            n_text = np.bincount(parents[is_t], minlength=n_docs).astype(np.int32)
            n_media = np.bincount(parents[is_m], minlength=n_docs).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    tb["__doc_id"].chunk(0) if n_docs else pa.array([], pa.string()),
                    tb["url"].chunk(0) if n_docs else pa.array([], pa.string()),
                    tb["host"].chunk(0) if n_docs else pa.array([], pa.string()),
                    tb["round"].chunk(0) if n_docs else pa.array([], pa.int32()),
                    tb["fetch_seq"].chunk(0) if n_docs else pa.array([], pa.int32()),
                    tb["not_before_ms"].chunk(0) if n_docs else pa.array([], pa.int64()),
                    spans,
                    links,
                    pa.array(n_text),
                    pa.array(n_media),
                ],
                names=[f.name for f in DOC_SCHEMA.fields],
            )

    return src.mapInArrow(extract, DOC_SCHEMA)


HTTP_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("fetch_seq", T.IntegerType(), False),
        T.StructField("not_before_ms", T.LongType(), True),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("fetch_ts_ms", T.LongType(), False),
    ]
)


def http_fetch_polite(
    scheduled: DataFrame,
    base_url: str,
    round_start_ms: int | None = None,
    timeout_s: float = 10.0,
    num_tasks: int | None = None,
) -> DataFrame:
    """The PRODUCTION fetch stage (S3): real HTTP GETs honoring the
    politeness plan in WALL-CLOCK time — the reference's per-path fetch
    with crawl-delay sleeps (ProcessWETPaths.scala:70,110), distributed.

    The scheduler's `not_before_ms` is a logical offset (frontier.py:
    schedule_round — host_ready + (fetch_seq-1)·crawl_delay); here it
    becomes real time: row r of host h is fetched no earlier than
    max(`round_start_ms + r.not_before_ms`, previous fetch on h +
    `crawl_delay_ms`) epoch ms — the second term is the reference's
    actual sleep-between-fetches behavior, and it is what still spaces a
    host's fetches when task start-up latency has already moved the
    absolute instants into the past. Rows are grouped per
    HOST (applyInPandas) so one task owns a host's whole sequence and
    executes it serially in fetch_seq order — per-host spacing is
    enforced by construction while distinct hosts fetch in parallel
    across the cluster (the same cogroup shape at any executor count).
    `base_url` maps a crawl URL to the wire target (test server, proxy,
    or '' to call the URL itself); response bodies stream back as the
    `payload` column feeding extract_documents unchanged, plus the
    actual `fetch_ts_ms` so politeness is auditable from the data
    (tests/test_http_fetch.py pins real inter-fetch spacing)."""
    import time as _time

    from urllib.parse import quote

    start_ms = int(_time.time() * 1000) if round_start_ms is None else round_start_ms

    def fetch_host(pdf):
        import time
        import urllib.request

        import pandas as pd

        pdf = pdf.sort_values("fetch_seq")
        out = {k: [] for k in ("url", "host", "fetch_seq", "not_before_ms",
                               "status", "payload", "fetch_ts_ms")}
        last_fetch_s = None
        for row in pdf.itertuples(index=False):
            nb = getattr(row, "not_before_ms", None)
            target_s = 0.0
            if nb is not None and not pd.isna(nb):
                target_s = (start_ms + int(nb)) / 1000.0
            cd = getattr(row, "crawl_delay_ms", None)
            if (
                last_fetch_s is not None
                and cd is not None
                and not pd.isna(cd)
            ):
                target_s = max(target_s, last_fetch_s + int(cd) / 1000.0)
            delay = target_s - time.time()
            if delay > 0:
                time.sleep(delay)
            t_fetch = int(time.time() * 1000)
            last_fetch_s = t_fetch / 1000.0
            target = (
                base_url + quote(str(row.url), safe="") if base_url else str(row.url)
            )
            try:
                with urllib.request.urlopen(target, timeout=timeout_s) as resp:
                    status = int(resp.status)
                    body = resp.read().decode("utf-8", errors="replace")
            except Exception:
                status, body = 599, None
            out["url"].append(str(row.url))
            out["host"].append(str(row.host))
            out["fetch_seq"].append(int(row.fetch_seq))
            out["not_before_ms"].append(None if nb is None or pd.isna(nb) else int(nb))
            out["status"].append(status)
            out["payload"].append(body)
            out["fetch_ts_ms"].append(t_fetch)
        return pd.DataFrame(out)

    cols = ["url", "host", "fetch_seq", "not_before_ms"]
    if "crawl_delay_ms" in scheduled.columns:
        cols.append("crawl_delay_ms")
    # Pin the host partitioning EXPLICITLY: a fetch task is TIME-bound
    # (sleep-dominated), not data-bound, so AQE's small-partition
    # coalescing — correct for byte-sized work — would fold every host
    # group onto one task and serialize all hosts' crawl-delay sleeps
    # (measured: 4 hosts back-to-back on this box). A user repartition is
    # exempt from AQE coalescing, and groupBy over an already
    # host-partitioned child elides its own exchange.
    n = num_tasks or scheduled.sparkSession.sparkContext.defaultParallelism
    return (
        scheduled.select(*cols)
        .repartition(n, "host")
        .groupBy("host")
        .applyInPandas(fetch_host, HTTP_FETCH_SCHEMA)
    )


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

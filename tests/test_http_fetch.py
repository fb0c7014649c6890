"""Wall-clock politeness e2e (VERDICT r4 #6): a real local HTTP server,
real GETs, and an assertion that the ACTUAL fetch timestamps honor the
scheduler's per-host crawl-delay plan on the wire — the reference's
ProcessWETPaths fetch-with-delay semantics (ProcessWETPaths.scala:70,110)
in real time, not logical time."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

import pytest
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators.frontier import (
    as_frontier_rows,
    canonicalize_seeds,
    schedule_round,
)
from commoncrawlscalatools_spark.sources.fetch import http_fetch_polite

DELAY_MS = 250


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        url = unquote(self.path.lstrip("/"))
        body = f"T:payload for {url}\nL:https://next.example.com/1".encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/"
    srv.shutdown()


def _schedule(spark, n_per_host=4, n_hosts=2):
    rows = [
        (f"https://host{h}.example.com/page/{i}", 0.5)
        for h in range(n_hosts)
        for i in range(n_per_host)
    ]
    seeds = spark.createDataFrame(rows, ["url", "priority"])
    frontier = as_frontier_rows(canonicalize_seeds(seeds), 0)
    delays = spark.createDataFrame(
        [(f"host{h}.example.com", DELAY_MS) for h in range(n_hosts)],
        ["host", "crawl_delay_ms"],
    )
    return schedule_round(frontier, None, delays, 1, per_host_cap=100)


def test_http_fetch_honors_crawl_delay_on_the_wire(spark, server):
    sched = _schedule(spark)
    start = int(time.time() * 1000)
    out = http_fetch_polite(sched, server, round_start_ms=start).collect()

    assert len(out) == 8
    assert all(r["status"] == 200 for r in out)
    # real bodies round-tripped through the wire
    assert all(r["payload"].startswith("T:payload for https://") for r in out)

    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host) == 2
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r["fetch_seq"])
        # fetch_seq dense and in wall-clock order
        assert [r["fetch_seq"] for r in rows] == list(range(1, len(rows) + 1))
        ts = [r["fetch_ts_ms"] for r in rows]
        assert ts == sorted(ts)
        # the wire-level politeness claim: consecutive fetches on one host
        # are >= crawl_delay apart (5% scheduling tolerance), and no fetch
        # fires before its not_before_ms instant
        for a, b in zip(rows, rows[1:]):
            gap = b["fetch_ts_ms"] - a["fetch_ts_ms"]
            assert gap >= DELAY_MS * 0.95, (host, gap)
        for r in rows:
            assert r["fetch_ts_ms"] >= start + r["not_before_ms"] - 5, (host, r)


def test_http_fetch_hosts_run_in_parallel_not_serialized(spark, server):
    """Politeness must serialize WITHIN a host, not across hosts. With 4
    hosts × 3 URLs at 250 ms spacing, a fully serialized execution is 4
    disjoint ~500 ms sequences; in parallel, sequences on different tasks
    overlap in time. groupBy(host) hash-partitions hosts, so two hosts CAN
    legitimately share one task (serial there) — assert that at least one
    host PAIR overlaps (robust to task-launch stagger and to hash
    collisions putting some hosts together)."""
    sched = _schedule(spark, n_per_host=3, n_hosts=4)
    t0 = time.time()
    out = http_fetch_polite(sched, server).collect()
    wall = time.time() - t0
    assert len(out) == 12
    host_walls = {}
    for r in out:
        host_walls.setdefault(r["host"], []).append(r["fetch_ts_ms"])
    spans = {h: (min(v), max(v)) for h, v in host_walls.items()}
    assert all(b - a >= 2 * DELAY_MS * 0.95 for a, b in spans.values())
    iv = list(spans.values())
    overlaps = [
        (a0 < b1 and b0 < a1)
        for i, (a0, a1) in enumerate(iv)
        for (b0, b1) in iv[i + 1:]
    ]
    assert any(overlaps), (spans, wall)


def test_http_fetch_payload_feeds_extractor(spark, server):
    """The wire payload drops into extract_documents unchanged — the
    production S3 path composes with the S2 extractor."""
    from commoncrawlscalatools_spark.sources.fetch import extract_documents

    sched = _schedule(spark, n_per_host=2)
    fetched = http_fetch_polite(sched, server)
    with_payload = fetched.join(
        _schedule(spark, n_per_host=2).select(
            "url", "url_hash", "round", "not_before_ms"
        ).withColumnRenamed("not_before_ms", "nb2"),
        "url",
    ).drop("nb2")
    docs = extract_documents(with_payload).collect()
    assert len(docs) == 4
    for d in docs:
        assert d["n_text_spans"] == 1
        assert len(d["outlinks"]) == 1
        assert d["spans"][0]["text"].startswith("payload for https://")

"""North-rule invariants vs a tiny pure-Python reference oracle: given the
same seed list and politeness budget, the engine must reproduce the crawl
ORDERING (round, host, fetch_seq) and the canonical URL-seen set exactly
(SURVEY.md §5 'new-engine test plan')."""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.functions.urls import canonical_url
from commoncrawlscalatools_spark.operators.frontier import (
    as_frontier_rows,
    canonicalize_seeds,
    crawl_order,
    schedule_round,
)

DELAY_MS = 1000  # DEFAULT_CRAWL_DELAY_MS


def _python_schedule(rows, per_host_cap, budget=None):
    """The politeness/priority scheduler in ~15 lines of plain Python.
    rows: (url, host, priority) with UNIQUE priorities (so the url_hash
    tie-break never fires and the oracle needs no xxhash64)."""
    by_host = {}
    for url, host, prio in rows:
        by_host.setdefault(host, []).append((url, prio))
    sched = []
    for host, items in by_host.items():
        items.sort(key=lambda x: -x[1])
        for seq, (url, prio) in enumerate(items[:per_host_cap], start=1):
            sched.append((host, url, prio, seq, (seq - 1) * DELAY_MS))
    if budget is not None:
        sched.sort(key=lambda x: -x[2])
        kept = sched[:budget]
        # re-rank dense per host within the surviving set
        out, per_host = [], {}
        for host, url, prio, _, _ in sorted(kept, key=lambda x: (x[0], -x[2])):
            seq = per_host.get(host, 0) + 1
            per_host[host] = seq
            out.append((host, url, prio, seq, (seq - 1) * DELAY_MS))
        sched = out
    return sorted(sched)


def _rows():
    # unique priorities, mixed hosts, a few more per host than the cap
    out = []
    p = 0.0
    for h in range(5):
        host = f"h{h}.example.com"
        for i in range(7):
            p += 1.0
            out.append((f"https://{host}/p/{i}", host, p))
    return out


def test_crawl_order_matches_python_oracle(spark):
    rows = _rows()
    frontier = as_frontier_rows(
        canonicalize_seeds(
            spark.createDataFrame(
                [(u, p) for u, _, p in rows], ["url", "priority"]
            )
        ),
        0,
    )
    sched = schedule_round(frontier, None, None, 1, per_host_cap=4)
    got = sorted(
        (r["host"], r["url"], r["priority"], r["fetch_seq"], r["not_before_ms"])
        for r in sched.collect()
    )
    assert got == _python_schedule(rows, per_host_cap=4)
    # total crawl order is (round, host, fetch_seq) — data-derived
    order = [
        (r["round"], r["host"], r["fetch_seq"]) for r in crawl_order(sched).collect()
    ]
    assert order == sorted(order)


def test_crawl_order_with_budget_matches_python_oracle(spark):
    rows = _rows()
    frontier = as_frontier_rows(
        canonicalize_seeds(
            spark.createDataFrame([(u, p) for u, _, p in rows], ["url", "priority"])
        ),
        0,
    )
    sched = schedule_round(frontier, None, None, 1, per_host_cap=4, budget=10)
    got = sorted(
        (r["host"], r["url"], r["priority"], r["fetch_seq"], r["not_before_ms"])
        for r in sched.collect()
    )
    assert got == _python_schedule(rows, per_host_cap=4, budget=10)


def test_canonical_seen_set_matches_handwritten_oracle(spark):
    """Hand-computed canonical forms (north rule: lowercase host, strip
    fragments/default ports, sort query params) — the URL-seen membership
    set is defined over exactly these strings."""
    cases = [
        ("HTTPS://WWW.Example.COM:443/a?z=1&a=2#frag",
         "https://www.example.com/a?a=2&z=1"),
        ("http://host.org:80/", "http://host.org/"),
        ("http://host.org:8080/x", "http://host.org:8080/x"),
        ("https://Host.org", "https://host.org/"),
        ("https://h.net/p?b=2&a=1&c=3", "https://h.net/p?a=1&b=2&c=3"),
        ("https://h.net/p#only-frag", "https://h.net/p"),
    ]
    df = spark.createDataFrame([(raw,) for raw, _ in cases], ["url"])
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]
    # seen-set equality: the deduped canonical set IS the python set
    seeds = spark.createDataFrame(
        [(raw, 1.0 * i) for i, (raw, _) in enumerate(cases)], ["url", "priority"]
    )
    seen = {r["url"] for r in canonicalize_seeds(seeds).collect()}
    assert seen == {want for _, want in cases}

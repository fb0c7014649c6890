"""End-to-end crawl loop: span-sequence invariants, outlink feedback,
checkpoint/resume equivalence (north rule)."""

import shutil

import pytest
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators.frontier import (
    as_frontier_rows,
    canonicalize_seeds,
    schedule_round,
)
from commoncrawlscalatools_spark.operators.robots import generate_robots
from commoncrawlscalatools_spark.plans.crawl import CrawlConfig, CrawlEngine
from commoncrawlscalatools_spark.sources.fetch import (
    extract_documents,
    fetch_and_extract,
    synthesize_payload,
)
from commoncrawlscalatools_spark.sources.seeds import generate_seeds


def _scheduled(spark, n=200, hosts=10):
    seeds = generate_seeds(spark, n, seed=3, n_hosts=hosts)
    fr = as_frontier_rows(canonicalize_seeds(seeds), 0)
    return schedule_round(fr, None, None, 1, per_host_cap=10)


def _py_extract(payload: str):
    """Pure-Python reference oracle for the extraction stage."""
    spans, links, off = [], [], 0
    for line in payload.split("\n"):
        if line.startswith("T:"):
            spans.append(("text", line[2:], None, off)); off += 1
        elif line.startswith("M:"):
            spans.append(("media", None, line[2:], off)); off += 1
        elif line.startswith("L:"):
            links.append(line[2:])
    return spans, links


def test_span_sequence_equality_vs_oracle(spark):
    wp = synthesize_payload(_scheduled(spark), n_hosts=10)
    docs = extract_documents(wp)
    joined = docs.join(wp.select("url", "payload"), "url").collect()
    assert len(joined) > 0
    for r in joined:
        exp_spans, exp_links = _py_extract(r["payload"])
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        assert got == exp_spans, "span-sequence equality (kind, text, media_ref, order)"
        assert list(r["outlinks"]) == exp_links


def test_span_offsets_ordered_and_kinds_consistent(spark):
    docs = fetch_and_extract(_scheduled(spark), n_hosts=10).collect()
    for r in docs:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == list(range(len(offs)))
        for s in r["spans"]:
            if s["kind"] == "text":
                assert s["text"] is not None and s["media_ref"] is None
            else:
                assert s["media_ref"] is not None and s["text"] is None


def test_fetch_deterministic_across_partitioning(spark):
    sched = _scheduled(spark)
    a = fetch_and_extract(sched.repartition(1), n_hosts=10).orderBy("doc_id").collect()
    b = fetch_and_extract(sched.repartition(9), n_hosts=10).orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


@pytest.fixture()
def store_root(tmp_path):
    root = str(tmp_path / "crawlstate")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_crawl_rounds_and_resume(spark, store_root):
    seeds = generate_seeds(spark, 300, seed=11, n_hosts=20)
    robots = generate_robots(spark, 20, seed=11)
    cfg = CrawlConfig(per_host_cap=5, n_hosts=20, use_bloom=True, bloom_buckets=8, doc_coalesce=2)
    eng = CrawlEngine(spark, store_root, cfg)
    eng.bootstrap(seeds, robots)
    m1 = eng.run(2)
    assert [m["round"] for m in m1] == [1, 2]
    assert all(m["fetched_docs"] == m["scheduled"] for m in m1)

    # resume: a new engine instance continues from round 2
    eng2 = CrawlEngine(spark, store_root, cfg)
    assert eng2.latest_round() == 2
    m2 = eng2.run(3)
    assert [m["round"] for m in m2] == [3]

    # URL-seen set equality: seen table == distinct frontier url_hashes
    seen = {r[0] for r in eng2.store.read("seen", 3).select("url_hash").collect()}
    fr = {r[0] for r in eng2.store.read("frontier", 3).select("url_hash").collect()}
    assert seen == fr

    # frontier states are consistent: every fetched row was pending before
    frontier = eng2.store.read("frontier", 3)
    states = {r["state"] for r in frontier.select("state").distinct().collect()}
    assert states <= {"pending", "fetched"}

    # lineage recorded per round
    lineage = eng2.store.read("lineage", 3)
    assert lineage.count() > 0

"""North-rule invariant: the engine's crawl ordering, URL-seen set, and
document contents are identical regardless of parallelism/partitioning.

A true two-SparkSession (local[2] vs local[8]) comparison runs in
bench/scaling (subprocess-per-level); inside one session the equivalent
stressor is radically different partitioning + shuffle-partition settings,
which is what executor count changes from the plan's point of view.
"""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators.frontier import (
    as_frontier_rows,
    canonicalize_seeds,
    schedule_round,
)
from commoncrawlscalatools_spark.operators.seen import filter_unseen
from commoncrawlscalatools_spark.sources.fetch import fetch_and_extract
from commoncrawlscalatools_spark.sources.seeds import generate_seeds


def _round_outputs(spark, seeds, parts):
    fr = as_frontier_rows(canonicalize_seeds(seeds.repartition(parts)), 0)
    sched = schedule_round(fr.repartition(parts), None, None, 1, per_host_cap=7)
    docs = fetch_and_extract(sched.repartition(parts), n_hosts=30)
    outlinks = docs.select(F.explode("outlinks").alias("url"))
    new_cand = canonicalize_seeds(outlinks.withColumn("priority", F.lit(0.5)))
    unseen = filter_unseen(new_cand, fr.select("url_hash"))
    order = [
        tuple(r)
        for r in sched.select("round", "host", "fetch_seq", "url", "not_before_ms")
        .orderBy("host", "fetch_seq")
        .collect()
    ]
    doc_rows = sorted(
        (r["doc_id"], tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]))
        for r in docs.select("doc_id", "spans").collect()
    )
    seen_set = sorted(r["url_hash"] for r in unseen.select("url_hash").collect())
    return order, doc_rows, seen_set


def test_round_identical_across_partitionings(spark):
    seeds = generate_seeds(spark, 600, seed=21, n_hosts=30)
    a = _round_outputs(spark, seeds, parts=1)
    b = _round_outputs(spark, seeds, parts=17)
    assert a[0] == b[0], "crawl order equality"
    assert a[1] == b[1], "span-sequence equality"
    assert a[2] == b[2], "URL-seen set equality"


def test_store_backed_rounds_identical_across_shuffle_settings(spark, tmp_path):
    """The FULL engine (snapshot commits included) must converge to
    identical state at different shuffle-partition settings: same frontier
    rows, same seen set, same document span sequences — and byte-identical
    Bloom state (fixed bucketing makes the filter bytes parallelism-free)."""
    from commoncrawlscalatools_spark.operators.robots import generate_robots
    from commoncrawlscalatools_spark.operators.seen import collect_bloom
    from commoncrawlscalatools_spark.plans.crawl import CrawlConfig, CrawlEngine

    def run(parts, root):
        cfg = CrawlConfig(per_host_cap=5, n_hosts=20, bloom_buckets=8,
                          bloom_bits=1 << 15, shuffle_partitions=parts,
                          doc_coalesce=2)
        eng = CrawlEngine(spark, str(root), cfg)
        eng.bootstrap(generate_seeds(spark, 300, seed=31, n_hosts=20),
                      generate_robots(spark, 20, seed=31))
        eng.run(2)
        seen = sorted(r[0] for r in eng.store.read("seen", 2).select("url_hash").collect())
        frontier = sorted(
            tuple(r) for r in eng.read_frontier(2)
            .select("url", "url_hash", "host", "state", "retries").collect()
        )
        docs = sorted(
            (r["doc_id"], tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                                for s in r["spans"]))
            for r in eng.store.read("documents", 2).select("doc_id", "spans").collect()
        )
        bloom = collect_bloom(eng.store.read("bloom", 2))
        return seen, frontier, docs, bloom

    a = run(3, tmp_path / "a")
    b = run(16, tmp_path / "b")
    assert a[0] == b[0], "URL-seen set equality"
    assert a[1] == b[1], "frontier state equality"
    assert a[2] == b[2], "document span-sequence equality"
    assert a[3] == b[3], "byte-identical Bloom state"

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
